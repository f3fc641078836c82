"""Dynamic-offset bit-field ops over (N, W) uint32 lanes.

BC7/BC6H index fields sit at *data-dependent* offsets (anchor pixels drop
their index MSB, and anchor positions depend on the per-block partition id,
amd_bc7_body.cpp:364-421). These helpers extract/insert fields whose bit
offset is a traced (N,) value, still branch-free: the word index turns into
a 4-way masked select, not a gather with dynamic shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def _shift_r(v: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """v >> s with s in [0, 32]; s == 32 yields 0 (XLA >> is UB at 32)."""
    s_ok = jnp.minimum(s, 31).astype(U32)
    return jnp.where(s >= 32, U32(0), (v >> s_ok).astype(U32))


def _shift_l(v: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    s_ok = jnp.minimum(s, 31).astype(U32)
    return jnp.where(s >= 32, U32(0), (v << s_ok).astype(U32))


def extract_dyn(words: jnp.ndarray, offset: jnp.ndarray,
                nbits: jnp.ndarray | int) -> jnp.ndarray:
    """words (N, W) uint32, offset (N,) int, nbits int or (N,) -> (N,) uint32."""
    n, w = words.shape
    widx = (offset // 32).astype(jnp.int32)
    sh = (offset % 32).astype(U32)
    lo = jnp.zeros((words.shape[0],), U32)
    hi = jnp.zeros((words.shape[0],), U32)
    for i in range(w):
        lo = jnp.where(widx == i, words[:, i], lo)
        if i + 1 < w:
            hi = jnp.where(widx == i, words[:, i + 1], hi)
    v = _shift_r(lo, sh) | _shift_l(hi, U32(32) - sh)
    nb = jnp.asarray(nbits, U32)
    m = jnp.where(nb >= 32, U32(0xFFFFFFFF),
                  (_shift_l(jnp.full_like(v, 1), nb) - U32(1)))
    return v & m


def insert_dyn(words: jnp.ndarray, value: jnp.ndarray, offset: jnp.ndarray,
               nbits: jnp.ndarray | int) -> jnp.ndarray:
    """OR ``value`` ((N,) any int) at per-block ``offset``; caller guarantees
    the field fits in ``nbits`` and target bits are zero."""
    n, w = words.shape
    nb = jnp.asarray(nbits, U32)
    m = jnp.where(nb >= 32, U32(0xFFFFFFFF),
                  _shift_l(jnp.full((n,), 1, U32), nb) - U32(1))
    v = value.astype(U32) & m
    widx = (offset // 32).astype(jnp.int32)
    sh = (offset % 32).astype(U32)
    lo = _shift_l(v, sh)
    hi = _shift_r(v, U32(32) - sh)
    cols = []
    for i in range(w):
        add = jnp.where(widx == i, lo, U32(0))
        if i > 0:
            add = add | jnp.where(widx == i - 1, hi, U32(0))
        cols.append(words[:, i] | add)
    return jnp.stack(cols, axis=1)

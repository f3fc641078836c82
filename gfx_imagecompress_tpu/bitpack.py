"""Vectorized bit-field packing/extraction over uint32 lanes.

The reference packs blocks with scalar shift/or C code scattered through every
encoder (e.g. amd_bcx_helpers.cpp:32-46,98-104; amd_bc7_body.cpp:100-119
``WriteBit``; amd_bc6h_body.cpp:44-104 ``BitHeader``). Here packing is one
vectorized pass: every block is W little-endian uint32 lanes and every field
write/read is a static-offset shift/or over the whole ``(N, W)`` batch —
branch-free and fully fusible by XLA.

Bit addressing: bit ``b`` of the 64/128-bit block lives in word ``b // 32``
at in-word position ``b % 32`` (little-endian, matching the reference's
``uint32*`` stores and the DDS on-disk layout).
"""
from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def field_or(words: jnp.ndarray, value: jnp.ndarray, start: int,
             nbits: int) -> jnp.ndarray:
    """OR an ``nbits``-wide field (static offset) into (N, W) uint32 lanes.

    ``value``: (N,) any int dtype; caller guarantees it fits in ``nbits``.
    Fields may straddle one word boundary (nbits <= 32).
    """
    assert 0 < nbits <= 32
    v = value.astype(U32) & mask(nbits)
    w, off = divmod(start, 32)
    lo = (v << U32(off)).astype(U32)
    words = words.at[:, w].set(words[:, w] | lo)
    if off + nbits > 32:
        hi = (v >> U32(32 - off)).astype(U32)
        words = words.at[:, w + 1].set(words[:, w + 1] | hi)
    return words


def extract(words: jnp.ndarray, start: int, nbits: int) -> jnp.ndarray:
    """Read an ``nbits``-wide field at static offset from (N, W) lanes -> (N,)."""
    assert 0 < nbits <= 32
    w, off = divmod(start, 32)
    v = (words[:, w].astype(U32) >> U32(off)).astype(U32)
    if off + nbits > 32:
        v = v | (words[:, w + 1].astype(U32) << U32(32 - off))
    return v & mask(nbits)


def mask(nbits: int) -> jnp.uint32:
    return U32((1 << nbits) - 1) if nbits < 32 else U32(0xFFFFFFFF)


def pack_indices(words: jnp.ndarray, indices: jnp.ndarray, start: int,
                 bits_per_index: int) -> jnp.ndarray:
    """Pack (N, 16) per-pixel indices LSB-first from ``start``.

    Unrolled statically over the 16 pixel positions (offsets are compile-time
    constants, so this lowers to 16 shift/or ops, not a loop).
    """
    for i in range(16):
        words = field_or(words, indices[:, i], start + i * bits_per_index,
                         bits_per_index)
    return words


def extract_indices(words: jnp.ndarray, start: int,
                    bits_per_index: int) -> jnp.ndarray:
    """Inverse of pack_indices -> (N, 16) int32."""
    cols = [extract(words, start + i * bits_per_index, bits_per_index)
            for i in range(16)]
    return jnp.stack(cols, axis=1).astype(jnp.int32)


def zeros(n: int, words_per_block: int) -> jnp.ndarray:
    return jnp.zeros((n, words_per_block), dtype=U32)


class Sink:
    """Column-based block builder: W independent (N,) uint32 accumulators.

    ``field_or`` on an (N, W) array lowers to per-column scatters
    (``.at[:, w].set``); hundreds of those (BC6H packs ~70 fields x 14
    modes) explode XLA compile time. Keeping each word as its own vector
    makes every field write a plain OR — no scatters anywhere — and a
    single stack at the end.
    """

    def __init__(self, n: int, words_per_block: int):
        self.cols = [jnp.zeros((n,), U32) for _ in range(words_per_block)]

    def put(self, value: jnp.ndarray, start: int, nbits: int) -> "Sink":
        assert 0 < nbits <= 32
        v = value.astype(U32) & mask(nbits)
        w, off = divmod(start, 32)
        self.cols[w] = self.cols[w] | (v << U32(off)).astype(U32)
        if off + nbits > 32:
            self.cols[w + 1] = self.cols[w + 1] | (
                v >> U32(32 - off)).astype(U32)
        return self

    def put_indices(self, indices: jnp.ndarray, start: int,
                    bits_per_index: int) -> "Sink":
        for i in range(16):
            self.put(indices[:, i], start + i * bits_per_index,
                     bits_per_index)
        return self

    def put_dyn(self, value: jnp.ndarray, offset: jnp.ndarray,
                nbits: jnp.ndarray | int) -> "Sink":
        """OR a field at a per-block dynamic bit offset (anchor-dependent
        index fields). Pure vector selects on the columns — no scatters."""
        nb = jnp.asarray(nbits, U32)
        m = jnp.where(nb >= 32, U32(0xFFFFFFFF),
                      (_shl(jnp.ones_like(nb, U32), nb) - U32(1)))
        v = value.astype(U32) & m
        widx = (offset // 32).astype(jnp.int32)
        sh = (offset % 32).astype(U32)
        lo = _shl(v, sh)
        hi = _shr(v, U32(32) - sh)
        for i in range(len(self.cols)):
            add = jnp.where(widx == i, lo, U32(0))
            if i > 0:
                add = add | jnp.where(widx == i - 1, hi, U32(0))
            self.cols[i] = self.cols[i] | add
        return self

    def words(self) -> jnp.ndarray:
        return jnp.stack(self.cols, axis=1)


def _shl(v: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    s_ok = jnp.minimum(s, U32(31))
    return jnp.where(s >= 32, U32(0), (v << s_ok).astype(U32))


def _shr(v: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    s_ok = jnp.minimum(s, U32(31))
    return jnp.where(s >= 32, U32(0), (v >> s_ok).astype(U32))

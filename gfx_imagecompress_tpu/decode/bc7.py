"""Bit-exact BC7 decoder (all 8 modes, batched).

New capability vs the reference (which ships no decoder; its GetRamp,
amd_bc7_body.cpp:123-252, is decoder-side math used only inside the
encoder). Semantics follow the exactly-specified BPTC decode:
  - endpoint dequantize: (v << (8-p)) | (v >> (2p-8)) after p-bit append,
  - interpolation: (e0*(64-w) + e1*w + 32) >> 6 with the 2/3/4-bit weight
    tables (tables/bc7_tables.py),
  - anchor pixels read one fewer index bit (MSB implicitly 0),
  - modes 4/5: dual index sets + component rotation.

Strategy: decode every block under each of the 8 static mode layouts and
select by the actual mode — uniform, branch-free, test-oracle code where
clarity beats the 8x redundant work (encode never calls this).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import bitpack
from ..bitpack_dyn import extract_dyn
from ..tables.bc7_tables import (BC7_MODES, WEIGHTS_BY_BITS, anchor_table,
                                 partition_table)

I32 = jnp.int32
U32 = jnp.uint32


def _dequant(v: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Expand a ``bits``-wide endpoint (pbit already appended) to 8 bits."""
    v = v.astype(I32)
    x = v << (8 - bits)
    return x | (x >> bits)


def interpolate(e0: jnp.ndarray, e1: jnp.ndarray, idx: jnp.ndarray,
                index_bits: int) -> jnp.ndarray:
    """Exact BC7 lerp: (e0*(64-w) + e1*w + 32) >> 6 (ints)."""
    w = jnp.asarray(WEIGHTS_BY_BITS[index_bits], I32)[idx]
    return (e0 * (64 - w) + e1 * w + 32) >> 6


def _index_offsets(partition, subsets: int, index_bits: int, start,
                   second: bool = False):
    """Per-pixel (offset, width) for the packed index field.

    partition: (N,) int32. Anchors drop one bit. ``start`` may be (N,) or a
    python int. Returns offsets (N,16) int32, widths (N,16) int32.
    """
    ptab = jnp.asarray(partition_table(subsets))      # (64,16)
    atab = jnp.asarray(anchor_table(subsets))         # (64,S)
    sub = ptab[partition]                             # (N,16)
    anch = atab[partition]                            # (N,S)
    is_anchor = jnp.zeros(sub.shape, bool)
    for s in range(subsets):
        pix = anch[:, s][:, None]                     # (N,1)
        iota = jnp.arange(16)[None, :]
        is_anchor = is_anchor | ((iota == pix) & (sub == s))
    widths = jnp.full(sub.shape, index_bits, I32) - is_anchor.astype(I32)
    if second:
        # the second index set of modes 4/5 always anchors pixel 0
        widths = jnp.full(sub.shape, index_bits, I32)
        widths = widths.at[:, 0].add(-1)
    csum = jnp.cumsum(widths, axis=1)
    offsets = jnp.concatenate(
        [jnp.zeros((sub.shape[0], 1), I32), csum[:, :-1]], axis=1)
    start = jnp.asarray(start, I32)
    if start.ndim == 0:
        start = jnp.broadcast_to(start, (sub.shape[0],))
    return offsets + start[:, None], widths, sub


def _decode_mode(words: jnp.ndarray, m) -> jnp.ndarray:
    """Decode all blocks as-if mode ``m`` -> (N, 16, 4) int32 RGBA."""
    n = words.shape[0]
    pos = m.mode + 1

    if m.partition_bits:
        partition = bitpack.extract(words, pos, m.partition_bits).astype(I32)
        pos += m.partition_bits
    else:
        partition = jnp.zeros((n,), I32)
    if m.rotation_bits:
        rotation = bitpack.extract(words, pos, m.rotation_bits).astype(I32)
        pos += m.rotation_bits
    else:
        rotation = jnp.zeros((n,), I32)
    if m.index_mode_bits:
        idx_mode = bitpack.extract(words, pos, 1).astype(I32)
        pos += 1
    else:
        idx_mode = jnp.zeros((n,), I32)

    neps = 2 * m.subsets
    chans = 3 + (1 if m.alpha_bits else 0)
    raw = []  # per channel, list of (N,) endpoint values
    for c in range(3):
        ch = []
        for e in range(neps):
            ch.append(bitpack.extract(words, pos, m.colour_bits).astype(I32))
            pos += m.colour_bits
        raw.append(ch)
    if m.alpha_bits:
        ch = []
        for e in range(neps):
            ch.append(bitpack.extract(words, pos, m.alpha_bits).astype(I32))
            pos += m.alpha_bits
        raw.append(ch)

    # p-bits
    if m.pbit_mode == "per_endpoint":
        pbits = []
        for e in range(neps):
            pbits.append(bitpack.extract(words, pos, 1).astype(I32))
            pos += 1
    elif m.pbit_mode == "shared":
        pbits = []
        shared = []
        for s in range(m.subsets):
            shared.append(bitpack.extract(words, pos, 1).astype(I32))
            pos += 1
        for e in range(neps):
            pbits.append(shared[e // 2])
    else:
        pbits = None

    # dequantized endpoints -> (N, neps, chans)
    eps = []
    for e in range(neps):
        comps = []
        for c in range(chans):
            bits = m.colour_bits if c < 3 else m.alpha_bits
            v = raw[c][e]
            if pbits is not None:
                v = (v << 1) | pbits[e]
                bits += 1
            comps.append(_dequant(v, bits))
        if chans == 3:
            comps.append(jnp.full((n,), 255, I32))
        eps.append(jnp.stack(comps, axis=-1))
    eps = jnp.stack(eps, axis=1)  # (N, neps, 4)

    # primary indices
    offs, widths, sub = _index_offsets(partition, m.subsets, m.index_bits, pos)
    idx1 = jnp.stack(
        [extract_dyn(words, offs[:, i], widths[:, i]) for i in range(16)],
        axis=1).astype(I32)
    total1 = 16 * m.index_bits - m.subsets
    pos2 = pos + total1

    if m.index_bits2:
        offs2, widths2, _ = _index_offsets(partition, 1, m.index_bits2, pos2,
                                           second=True)
        idx2 = jnp.stack(
            [extract_dyn(words, offs2[:, i], widths2[:, i])
             for i in range(16)], axis=1).astype(I32)
    else:
        idx2 = idx1

    e0 = jnp.take_along_axis(eps, (2 * sub)[:, :, None], axis=1)   # (N,16,4)
    e1 = jnp.take_along_axis(eps, (2 * sub + 1)[:, :, None], axis=1)

    if m.index_bits2:
        # mode 4/5: colour uses idx1 (index_bits), alpha uses idx2
        # (index_bits2); idx_mode==1 swaps the two sets (mode 4 only).
        c_a = interpolate(e0[..., :3], e1[..., :3], idx1[:, :, None],
                          m.index_bits)
        a_a = interpolate(e0[..., 3], e1[..., 3], idx2, m.index_bits2)
        c_b = interpolate(e0[..., :3], e1[..., :3], idx2[:, :, None],
                          m.index_bits2)
        a_b = interpolate(e0[..., 3], e1[..., 3], idx1, m.index_bits)
        swap = (idx_mode == 1)[:, None]
        rgb = jnp.where(swap[..., None], c_b, c_a)
        a = jnp.where(swap, a_b, a_a)
        out = jnp.concatenate([rgb, a[..., None]], axis=-1)
        # rotation: swap A with R/G/B (1/2/3)
        rot = rotation[:, None]
        for r, c in ((1, 0), (2, 1), (3, 2)):
            do = (rot == r)
            ch = out[..., c]
            al = out[..., 3]
            out = out.at[..., c].set(jnp.where(do, al, ch))
            out = out.at[..., 3].set(jnp.where(do, ch, al))
        return out
    else:
        return interpolate(e0, e1, idx1[:, :, None], m.index_bits)


def decode_bc7(words: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) uint32 -> (N, 16, 4) int32 RGBA in [0, 255]."""
    byte0 = words[:, 0] & U32(0xFF)
    # mode = index of lowest set bit; all-zero byte -> invalid (mode 8)
    mode = jnp.full(byte0.shape, 8, I32)
    for b in range(7, -1, -1):
        mode = jnp.where((byte0 & U32(1 << b)) != 0, b, mode)
    out = jnp.zeros((words.shape[0], 16, 4), I32)
    for m in BC7_MODES:
        dec = _decode_mode(words, m)
        out = jnp.where((mode == m.mode)[:, None, None], dec, out)
    return out

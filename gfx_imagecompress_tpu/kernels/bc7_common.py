"""BC7 encoder-side shared machinery: p-bit aware quantization, exact
palettes, and block packing with anchor-index fixups.

Packing mirrors EncodeSingleIndexBlock/EncodeDualIndexBlock
(amd_bc7_body.cpp:333-538, 902-1056) as vectorized shift/or: the anchor
pixel of each subset must store an index with MSB 0, so the packer swaps
that subset's endpoints and complements its indices when needed (the
"fixup-index MSB-drop + endpoint flip", bc7_body:364-421). For the dual
index modes the colour (RGB) and alpha (A) endpoint fields swap
*independently* since each has its own index set.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import bitpack
from ..decode.bc7 import _index_offsets, interpolate
from ..tables.bc7_tables import BC7Mode, WEIGHTS_BY_BITS

F32 = jnp.float32
I32 = jnp.int32


def quantize_pbit(e: jnp.ndarray, bits: int, p: jnp.ndarray | int):
    """Quantize float endpoint (0..255) to a ``bits``-field given pbit value.

    Returns (q, dequantized 8-bit int). The effective precision is bits+1
    with LSB = p (bc7enc16's explicit p-bit rounding derivation,
    richgel999_bc7enc16.cpp:606-733).
    """
    p = jnp.asarray(p, I32)
    total = bits + 1
    scale = (1 << total) - 1
    w = e * (scale / 255.0)
    q = jnp.clip(jnp.round((w - p.astype(F32)) * 0.5), 0,
                 (1 << bits) - 1).astype(I32)
    full = (q << 1) | p
    deq = _expand(full, total)
    return q, deq


def quantize_plain(e: jnp.ndarray, bits: int):
    """Quantize float endpoint (0..255) to ``bits`` with bit-replicated
    reconstruction; returns (q, dequantized 8-bit int)."""
    scale = (1 << bits) - 1
    q = jnp.clip(jnp.round(e * (scale / 255.0)), 0, scale).astype(I32)
    return q, _expand(q, bits)


def _expand(v: jnp.ndarray, bits: int) -> jnp.ndarray:
    x = v << (8 - bits)
    return x | (x >> bits)


def palette(e0deq: jnp.ndarray, e1deq: jnp.ndarray, index_bits: int):
    """Exact decode palette from dequantized int endpoints.

    e0deq/e1deq: (..., C) int32 -> (..., K, C) float32, K = 2**index_bits.
    """
    k = 1 << index_bits
    idx = jnp.arange(k)
    w = jnp.asarray(WEIGHTS_BY_BITS[index_bits], I32)[idx]  # (K,)
    pal = (e0deq[..., None, :] * (64 - w)[:, None]
           + e1deq[..., None, :] * w[:, None] + 32) >> 6
    return pal.astype(F32)


def fixup_subset(idx, sub, anchors, q0, q1, index_bits: int, subsets: int):
    """Anchor-MSB fixups for a single-index mode.

    idx (N,16) int32; sub (N,16) subset ids; anchors (N,S) anchor pixel per
    subset; q0/q1 (N,S,C) quantized endpoint fields (pbit included by caller
    convention: see pack_single). Returns flipped (idx, q0, q1).
    """
    msb = 1 << (index_bits - 1)
    comp = (1 << index_bits) - 1
    for s in range(subsets):
        anchor_idx = jnp.take_along_axis(idx, anchors[:, s:s + 1], axis=1)
        need = (anchor_idx[:, 0] & msb) != 0                      # (N,)
        in_sub = (sub == s)
        idx = jnp.where(need[:, None] & in_sub, comp - idx, idx)
        swap = need[:, None]
        q0s, q1s = q0[:, s], q1[:, s]
        q0 = q0.at[:, s].set(jnp.where(swap, q1s, q0s))
        q1 = q1.at[:, s].set(jnp.where(swap, q0s, q1s))
    return idx, q0, q1


def pack_single(mode: BC7Mode, partition, q0, q1, pb0, pb1, idx):
    """Pack a single-index mode block.

    partition (N,), q0/q1 (N,S,C) quantized endpoint fields (C=3 or 4,
    WITHOUT pbit), pb0/pb1 (N,S) p-bit values (ignored if mode has none),
    idx (N,16) full-width indices. Performs anchor fixups internally.
    Returns (N,4) uint32 words.
    """
    from ..tables.bc7_tables import anchor_table, partition_table
    n = partition.shape[0]
    s_count = mode.subsets
    ptab = jnp.asarray(partition_table(s_count))
    atab = jnp.asarray(anchor_table(s_count))
    sub = ptab[partition]
    anchors = atab[partition]

    # bundle pbits into the swap by treating them as an extra channel
    if mode.pbit_mode != "none":
        qq0 = jnp.concatenate([q0, pb0[..., None]], axis=-1)
        qq1 = jnp.concatenate([q1, pb1[..., None]], axis=-1)
    else:
        qq0, qq1 = q0, q1
    idx, qq0, qq1 = fixup_subset(idx, sub, anchors, qq0, qq1,
                                 mode.index_bits, s_count)
    if mode.pbit_mode != "none":
        q0, pb0 = qq0[..., :-1], qq0[..., -1]
        q1, pb1 = qq1[..., :-1], qq1[..., -1]
    else:
        q0, q1 = qq0, qq1

    sink = bitpack.Sink(n, 4)
    sink.put(jnp.full((n,), 1 << mode.mode, I32), 0, mode.mode + 1)
    pos = mode.mode + 1
    if mode.partition_bits:
        sink.put(partition, pos, mode.partition_bits)
        pos += mode.partition_bits
    chans = q0.shape[-1]
    for c in range(chans):
        bits = mode.colour_bits if c < 3 else mode.alpha_bits
        for s in range(s_count):
            sink.put(q0[:, s, c], pos, bits)
            pos += bits
            sink.put(q1[:, s, c], pos, bits)
            pos += bits
    if mode.pbit_mode == "per_endpoint":
        for s in range(s_count):
            sink.put(pb0[:, s], pos, 1)
            pos += 1
            sink.put(pb1[:, s], pos, 1)
            pos += 1
    elif mode.pbit_mode == "shared":
        for s in range(s_count):
            sink.put(pb0[:, s], pos, 1)
            pos += 1
    offs, widths, _ = _index_offsets(partition, s_count, mode.index_bits, pos)
    for i in range(16):
        sink.put_dyn(idx[:, i], offs[:, i], widths[:, i])
    return sink.words()


def pack_dual(mode: BC7Mode, rotation, idx_mode, qc0, qc1, qa0, qa1,
              cidx, aidx):
    """Pack a dual-index mode (4/5) block.

    rotation (N,), idx_mode (N,) (mode 4 index-selection bit; pass zeros for
    mode 5), qc0/qc1 (N,3) colour endpoint fields, qa0/qa1 (N,) alpha
    fields, cidx (N,16) indices of the FIRST stored field (width
    mode.index_bits), aidx (N,16) indices of the SECOND stored field (width
    mode.index_bits2). Decode convention (decode/bc7.py:164-176): field 1
    drives colour when idx_mode == 0 and alpha when idx_mode == 1 — so each
    field's anchor fixup swaps the endpoint pair that field drives
    (EncodeDualIndexBlock semantics, amd_bc7_body.cpp:937-988).
    Anchor for both sets is pixel 0.
    """
    n = rotation.shape[0]
    sel1 = (idx_mode == 0)[:, None]      # field1 drives colour?
    msb1 = 1 << (mode.index_bits - 1)
    comp1 = (1 << mode.index_bits) - 1
    need = (cidx[:, 0] & msb1) != 0
    cidx = jnp.where(need[:, None], comp1 - cidx, cidx)
    sw_c1 = need[:, None] & sel1         # field1 flip hits colour endpoints
    sw_a1 = need & ~sel1[:, 0]           # ... or alpha endpoints
    qc0, qc1 = (jnp.where(sw_c1, qc1, qc0), jnp.where(sw_c1, qc0, qc1))
    qa0, qa1 = (jnp.where(sw_a1, qa1, qa0), jnp.where(sw_a1, qa0, qa1))
    msb2 = 1 << (mode.index_bits2 - 1)
    comp2 = (1 << mode.index_bits2) - 1
    need2 = (aidx[:, 0] & msb2) != 0
    aidx = jnp.where(need2[:, None], comp2 - aidx, aidx)
    sw_a2 = need2 & sel1[:, 0]           # field2 drives the other pair
    sw_c2 = need2[:, None] & ~sel1
    qa0, qa1 = (jnp.where(sw_a2, qa1, qa0), jnp.where(sw_a2, qa0, qa1))
    qc0, qc1 = (jnp.where(sw_c2, qc1, qc0), jnp.where(sw_c2, qc0, qc1))

    sink = bitpack.Sink(n, 4)
    sink.put(jnp.full((n,), 1 << mode.mode, I32), 0, mode.mode + 1)
    pos = mode.mode + 1
    sink.put(rotation, pos, 2)
    pos += 2
    if mode.index_mode_bits:
        sink.put(idx_mode, pos, 1)
        pos += 1
    for c in range(3):
        sink.put(qc0[:, c], pos, mode.colour_bits)
        pos += mode.colour_bits
        sink.put(qc1[:, c], pos, mode.colour_bits)
        pos += mode.colour_bits
    sink.put(qa0, pos, mode.alpha_bits)
    pos += mode.alpha_bits
    sink.put(qa1, pos, mode.alpha_bits)
    pos += mode.alpha_bits
    for i in range(16):
        w = mode.index_bits - (1 if i == 0 else 0)
        sink.put(cidx[:, i], pos, w)
        pos += w
    for i in range(16):
        w = mode.index_bits2 - (1 if i == 0 else 0)
        sink.put(aidx[:, i], pos, w)
        pos += w
    return sink.words()

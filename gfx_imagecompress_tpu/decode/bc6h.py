"""Bit-exact BC6H decoder (14 modes, signed + unsigned, batched).

New capability vs the reference (no decoder shipped; its decode-side helpers
``decompress_endpoints1/2`` + ``finish_unquantizeF16`` live inside the
encoder, amd_bc6h_body.cpp:1039-1252). Semantics are the exactly-specified
D3D11 19.5 pipeline, all int32:

  unquantize (unsigned):  prec >= 15 -> q; 0 -> 0; max -> 0xFFFF;
                          else ((q << 16) + 0x8000) >> prec
  unquantize (signed):    prec >= 16 -> q; on |q|, with (prec-1), max ->
                          0x7FFF; sign reapplied
  palette:                (e0*(64-w) + e1*w + 32) >> 6, 3/4-bit weights
  finish:                 unsigned (v*31) >> 6; signed sign*((|v|*31) >> 5)
                          -> the raw half-float bit pattern (sign-magnitude)

The output is float32 obtained by bit-casting the reconstructed half bits.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import bitpack
from ..bitpack_dyn import extract_dyn
from ..tables.bc6h_tables import (BC6H_MODES, LAYOUTS, ONE_REGION_INDEX_BIT,
                                  TWO_REGION_INDEX_BIT, TWO_REGION_SHAPE_BIT)
from ..tables.bc7_tables import (ANCHOR2, WEIGHTS3, WEIGHTS4, partition_table)

I32 = jnp.int32
U32 = jnp.uint32


def _sign_extend(v: jnp.ndarray, bits: int) -> jnp.ndarray:
    s = 1 << (bits - 1)
    return (v.astype(I32) ^ s) - s


def _unquantize(q: jnp.ndarray, prec: int, signed: bool) -> jnp.ndarray:
    q = q.astype(I32)
    if not signed:
        if prec >= 15:
            return q
        maxq = (1 << prec) - 1
        u = ((q << 16) + 0x8000) >> prec
        u = jnp.where(q == 0, 0, u)
        return jnp.where(q == maxq, 0xFFFF, u)
    if prec >= 16:
        return q
    s = q < 0
    a = jnp.abs(q)
    maxa = (1 << (prec - 1)) - 1
    u = ((a << 15) + 0x4000) >> (prec - 1)
    u = jnp.where(a == 0, 0, u)
    u = jnp.where(a >= maxa, 0x7FFF, u)
    return jnp.where(s, -u, u)


def _finish(v: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """Interpolated value -> half-float bit pattern (sign-magnitude)."""
    if not signed:
        return (v * 31) >> 6
    mag = (jnp.abs(v) * 31) >> 5
    return jnp.where(v < 0, mag | 0x8000, mag)


def half_bits_to_f32(h: jnp.ndarray) -> jnp.ndarray:
    """(..., ) int32 half bit patterns -> float32."""
    h16 = h.astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(h16, jnp.float16).astype(jnp.float32)


def _decode_mode(words: jnp.ndarray, m, signed: bool) -> jnp.ndarray:
    """Decode all blocks as-if BC6H mode ``m`` -> (N, 16, 3) int32 half bits."""
    n = words.shape[0]
    # gather endpoint fields
    vals = {f: jnp.zeros((n,), I32) for f in
            ("rw", "gw", "bw", "rx", "gx", "bx",
             "ry", "gy", "by", "rz", "gz", "bz")}
    for field, src, dst, nbits in LAYOUTS[m.mode]:
        piece = bitpack.extract(words, dst, nbits).astype(I32)
        vals[field] = vals[field] | (piece << src)

    prec = m.base_bits
    base = [vals["rw"], vals["gw"], vals["bw"]]
    if signed:
        base = [_sign_extend(b, prec) for b in base]
    others = {}
    for i, ch in enumerate(("r", "g", "b")):
        db = m.delta_bits[i]
        for suff in ("x", "y", "z"):
            v = vals[ch + suff]
            if m.transformed:
                d = _sign_extend(v, db)
                w = base[i] + d
                # wrap to prec bits (foreign blocks may overflow; ours never)
                w = w & ((1 << prec) - 1)
                if signed:
                    w = _sign_extend(w, prec)
            else:
                w = _sign_extend(v, db) if signed else v
            others[ch + suff] = w

    e = jnp.stack(
        [jnp.stack(base, -1),
         jnp.stack([others["rx"], others["gx"], others["bx"]], -1),
         jnp.stack([others["ry"], others["gy"], others["by"]], -1),
         jnp.stack([others["rz"], others["gz"], others["bz"]], -1)],
        axis=1)                                           # (N, 4, 3)
    u = _unquantize(e, prec, signed)                      # (N, 4, 3)

    if m.regions == 2:
        shape = bitpack.extract(words, TWO_REGION_SHAPE_BIT, 5).astype(I32)
        ptab = jnp.asarray(partition_table(2)[:32])
        sub = ptab[shape]                                 # (N,16)
        anchor1 = jnp.asarray(ANCHOR2, I32)[shape]        # (N,)
        # anchors are always 2, 8 or 15: extract with three STATIC layouts
        # and select (cheap vector ops instead of dynamic-offset extraction)
        idx = jnp.zeros((n, 16), I32)
        for a in (2, 8, 15):
            pos = TWO_REGION_INDEX_BIT
            cols = []
            for i in range(16):
                wbits = 2 if i in (0, a) else 3
                cols.append(bitpack.extract(words, pos, wbits).astype(I32))
                pos += wbits
            cand = jnp.stack(cols, axis=1)
            idx = jnp.where((anchor1 == a)[:, None], cand, idx)
        wtab = jnp.asarray(WEIGHTS3, I32)
        e0 = jnp.where((sub == 0)[:, :, None], u[:, 0:1], u[:, 2:3])
        e1 = jnp.where((sub == 0)[:, :, None], u[:, 1:2], u[:, 3:4])
    else:
        pos = ONE_REGION_INDEX_BIT
        idx_cols = [bitpack.extract(words, pos, 3).astype(I32)]
        pos += 3
        for i in range(1, 16):
            idx_cols.append(bitpack.extract(words, pos, 4).astype(I32))
            pos += 4
        idx = jnp.stack(idx_cols, axis=1)
        wtab = jnp.asarray(WEIGHTS4, I32)
        e0 = jnp.broadcast_to(u[:, 0:1], (n, 16, 3))
        e1 = jnp.broadcast_to(u[:, 1:2], (n, 16, 3))

    w = wtab[idx][:, :, None]                             # (N,16,1)
    v = (e0 * (64 - w) + e1 * w + 32) >> 6
    return _finish(v, signed)


def decode_bc6h_half(words: jnp.ndarray, signed: bool = False) -> jnp.ndarray:
    """(N, 4) uint32 -> (N, 16, 3) int32 half-float bit patterns."""
    code2 = (words[:, 0] & U32(0x3)).astype(I32)
    code5 = (words[:, 0] & U32(0x1F)).astype(I32)
    out = jnp.zeros((words.shape[0], 16, 3), I32)
    for m in BC6H_MODES:
        dec = _decode_mode(words, m, signed)
        sel = (code2 == m.code) if m.code_bits == 2 else (code5 == m.code)
        out = jnp.where(sel[:, None, None], dec, out)
    return out


def decode_bc6h(words: jnp.ndarray, signed: bool = False) -> jnp.ndarray:
    """(N, 4) uint32 -> (N, 16, 3) float32."""
    return half_bits_to_f32(decode_bc6h_half(words, signed))

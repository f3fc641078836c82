"""Fused BC4/BC3-alpha scalar encoder as a Pallas TPU kernel.

Same design as bc1_pallas.py: the whole scalar-ramp search (LSQ fits for
both ramp families, trimmed-interval seeds via an in-register sorting
network, joint hill-climb sweeps, 8pt/6pt race, DXT5 index packing) runs
in one VMEM-resident program with blocks on the lane axis. Semantics mirror
kernels/bc4.py (amd_bcx_helpers.cpp:125-140 race) with the same exact
integer ramps as decode/bcn.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

SUB = 8          # sublane dim of the per-block tile
LANE = 128
TILE = SUB * LANE    # blocks per grid step ((8,128) native f32 vreg tile)
W8 = (0.0, 1.0, 1 / 7, 2 / 7, 3 / 7, 4 / 7, 5 / 7, 6 / 7)
W6 = (0.0, 1.0, 1 / 5, 2 / 5, 3 / 5, 4 / 5)


def _div7(x):
    """floor(x/7) for 0 <= x <= 1800 (multiply-shift)."""
    return (x * 9363) >> 16


def _div5(x):
    """floor(x/5) for 0 <= x <= 1600."""
    return (x * 13108) >> 16


def _palette(a0, a1, eight: bool):
    """Exact integer ramp, list of 8 (1,T) int32 (6-mode pads 0/255)."""
    pal = [a0, a1]
    for i in range(2, 8):
        if eight:
            pal.append(_div7((8 - i) * a0 + (i - 1) * a1 + 3))
        elif i < 6:
            pal.append(_div5((6 - i) * a0 + (i - 1) * a1 + 2))
        else:
            pal.append(jnp.zeros_like(a0) + (0 if i == 6 else 255))
    return pal


def _assign(vals, pal):
    """vals (16,T) f32, pal list of 8 (1,T) int -> idx (16,T), err (1,T)."""
    best = None
    idx = None
    for k, p in enumerate(pal):
        d = vals - p.astype(F32)
        d = d * d
        if best is None:
            best, idx = d, jnp.zeros_like(d, I32)
        else:
            take = d < best
            best = jnp.where(take, d, best)
            idx = jnp.where(take, k, idx)
    return idx, jnp.sum(best, axis=0, keepdims=True)


def _assign_err(vals, pal):
    """Error-only variant of :func:`_assign` — the sweep's inner loop needs
    no indices (they are requantized once for the winner), and dropping
    the per-entry index select nearly halves its lane ops."""
    best = None
    for p in pal:
        d = vals - p.astype(F32)
        d = d * d
        best = d if best is None else jnp.minimum(best, d)
    return jnp.sum(best, axis=0, keepdims=True)


def _lsq(vals, alphas, m, e0, e1):
    q00 = jnp.sum(m * (1 - alphas) ** 2, axis=0, keepdims=True)
    q01 = jnp.sum(m * alphas * (1 - alphas), axis=0, keepdims=True)
    q11 = jnp.sum(m * alphas * alphas, axis=0, keepdims=True)
    b0 = jnp.sum(m * (1 - alphas) * vals, axis=0, keepdims=True)
    b1 = jnp.sum(m * alphas * vals, axis=0, keepdims=True)
    det = q00 * q11 - q01 * q01
    ok = jnp.abs(det) > 1e-6
    inv = 1.0 / jnp.where(ok, det, 1.0)
    n0 = (q11 * b0 - q01 * b1) * inv
    n1 = (q00 * b1 - q01 * b0) * inv
    return jnp.where(ok, n0, e0), jnp.where(ok, n1, e1)


def _fit_ramp(vals, weights, interp_slots: int, iters: int,
              literal_extremes: bool):
    e0 = jnp.min(vals, axis=0, keepdims=True)
    e1 = jnp.max(vals, axis=0, keepdims=True)
    lv = [jnp.float32(w) for w in weights[:interp_slots]]
    for _ in range(iters):
        best = None
        alpha = None
        interior = None
        for k, l in enumerate(lv):
            p = e0 + l * (e1 - e0)
            d = (vals - p) ** 2
            if best is None:
                best, alpha = d, jnp.zeros_like(d) + l
                interior = jnp.ones_like(d)
            else:
                take = d < best
                best = jnp.where(take, d, best)
                alpha = jnp.where(take, l, alpha)
                interior = jnp.where(take, 1.0, interior)
        if literal_extremes:
            for ext in (0.0, 255.0):
                d = (vals - ext) ** 2
                take = d < best
                best = jnp.where(take, d, best)
                interior = jnp.where(take, 0.0, interior)
        m = interior if literal_extremes else jnp.ones_like(vals)
        e0, e1 = _lsq(vals, alpha, m, e0, e1)
    return e0, e1


def _sweep(vals, a0, a1, radius: int, eight: bool, rounds: int):
    """Joint (a0, a1) hill climb; error-only inner loop (indices are
    requantized once for the final winner in :func:`_bc4_search`).
    Rounds after the first use radius 1 (kernels/bc4.py parity)."""
    best_a0, best_a1 = a0, a1
    best = _assign_err(vals, _palette(a0, a1, eight))
    for r in range(rounds):
        rad = radius if r == 0 else 1
        c_a0, c_a1 = best_a0, best_a1
        for d0 in range(-rad, rad + 1):
            for d1 in range(-rad, rad + 1):
                if d0 == 0 and d1 == 0:
                    continue
                c0 = jnp.clip(c_a0 + d0, 0, 255)
                c1 = jnp.clip(c_a1 + d1, 0, 255)
                ok = (c0 > c1) if eight else (c0 <= c1)
                e2 = _assign_err(vals, _palette(c0, c1, eight))
                e2 = jnp.where(ok, e2, jnp.float32(3.4e38))
                take = e2 < best
                best_a0 = jnp.where(take, c0, best_a0)
                best_a1 = jnp.where(take, c1, best_a1)
                best = jnp.where(take, e2, best)
    return best_a0, best_a1, best


def _oem_pairs(n):
    """Batcher odd-even mergesort compare-exchange pairs (n = power of 2)."""
    pairs = []

    def merge(lo, cnt, r):
        m = r * 2
        if m < cnt:
            merge(lo, cnt, m)
            merge(lo + r, cnt, m)
            for i in range(lo + r, lo + cnt - r, m):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, cnt):
        if cnt > 1:
            m = cnt // 2
            sort(lo, m)
            sort(lo + m, m)
            merge(lo, cnt, 1)

    sort(0, n)
    return pairs


_SORT16 = _oem_pairs(16)


def _sorted_rows(vals):
    """(16,T) -> list of 16 sorted (1,T) rows via a sorting network."""
    rows = [vals[i:i + 1] for i in range(16)]
    for a, b in _SORT16:
        lo = jnp.minimum(rows[a], rows[b])
        hi = jnp.maximum(rows[a], rows[b])
        rows[a], rows[b] = lo, hi
    return rows


def _best_of(r1, r2):
    a0a, a1a, ea = r1
    a0b, a1b, eb = r2
    take = eb < ea
    return (jnp.where(take, a0b, a0a), jnp.where(take, a1b, a1a),
            jnp.where(take, eb, ea))


def _bc4_search(vals, iters, radius, rounds):
    """Full scalar-ramp search for one (16,T) channel.

    Returns (a0, a1, idx, err) with idx already in DXT5 index space.
    """
    vmin = jnp.clip(jnp.round(jnp.min(vals, axis=0, keepdims=True)),
                    0, 255).astype(I32)
    vmax = jnp.clip(jnp.round(jnp.max(vals, axis=0, keepdims=True)),
                    0, 255).astype(I32)

    # ---- 8-point mode (a0 > a1): seed race, sweep the winner once
    # (kernels/bc4.py parity)
    e0, e1 = _fit_ramp(vals, W8, 8, iters, False)
    hi = jnp.clip(jnp.round(jnp.maximum(e0, e1)), 0, 255).astype(I32)
    lo = jnp.clip(jnp.round(jnp.minimum(e0, e1)), 0, 255).astype(I32)
    hi8 = jnp.where(hi > lo, hi, jnp.minimum(hi + 1, 255))
    vmax8 = jnp.where(vmax > vmin, vmax, jnp.minimum(vmax + 1, 255))
    e_fit = _assign_err(vals, _palette(hi8, lo, True))
    e_mm = _assign_err(vals, _palette(vmax8, vmin, True))
    mm = e_mm < e_fit
    s0 = jnp.where(mm, vmax8, hi8)
    s1 = jnp.where(mm, vmin, lo)
    a0_8, a1_8, err8 = _sweep(vals, s0, s1, radius, True, rounds)

    # ---- 6-point mode (a0 <= a1, literal 0/255 slots): LSQ seed races the
    # trimmed-interval seeds, one sweep from the winner
    e0, e1 = _fit_ramp(vals, W6, 6, iters, True)
    lo6 = jnp.clip(jnp.round(jnp.minimum(e0, e1)), 0, 255).astype(I32)
    hi6 = jnp.clip(jnp.round(jnp.maximum(e0, e1)), 0, 255).astype(I32)
    sv = _sorted_rows(vals)
    seed = (lo6, hi6, _assign_err(vals, _palette(lo6, hi6, False)))
    for i in (0, 1, 2):
        for j in (0, 1, 2):
            s0 = jnp.clip(jnp.round(sv[i]), 0, 255).astype(I32)
            s1 = jnp.clip(jnp.round(sv[15 - j]), 0, 255).astype(I32)
            s1 = jnp.maximum(s1, s0)
            e = _assign_err(vals, _palette(s0, s1, False))
            take = e < seed[2]
            seed = (jnp.where(take, s0, seed[0]),
                    jnp.where(take, s1, seed[1]),
                    jnp.where(take, e, seed[2]))
    a0_6, a1_6, err6 = _sweep(vals, seed[0], seed[1], radius, False, rounds)

    use8 = err8 <= err6
    a0 = jnp.where(use8, a0_8, a0_6)
    a1 = jnp.where(use8, a1_8, a1_6)
    err = jnp.where(use8, err8, err6)
    # single index requantize for the winner (both ramp families share the
    # encode: the mode is implied by a0<=>a1, so select the palette)
    idx8, _ = _assign(vals, _palette(a0, a1, True))
    idx6, _ = _assign(vals, _palette(a0, a1, False))
    idx = jnp.where(use8, idx8, idx6)
    return a0, a1, idx, err


def _pack_dxt5(a0, a1, idx):
    """DXT5-style pack (amd_bcx_helpers.cpp:32-46 layout) -> (w0, w1)."""
    w0 = a0.astype(U32) | (a1.astype(U32) << 8)
    for p in range(5):
        w0 = w0 | (idx[p:p + 1].astype(U32) << U32(16 + 3 * p))
    i5 = idx[5:6].astype(U32)
    w0 = w0 | ((i5 & 1) << 31)
    w1 = (i5 & 6) >> 1
    for p in range(6, 16):
        w1 = w1 | (idx[p:p + 1].astype(U32) << U32(2 + 3 * (p - 6)))
    return w0, w1


def _bc4_kernel(x_ref, w0_ref, w1_ref, err_ref, *, iters, radius, rounds):
    vals = x_ref[:, 0].astype(F32) * 255.0                # (16,SUB,LANE)
    a0, a1, idx, err = _bc4_search(vals, iters, radius, rounds)
    w0, w1 = _pack_dxt5(a0, a1, idx)
    w0_ref[:] = w0
    w1_ref[:] = w1
    err_ref[:] = err


def _bc5_kernel(x_ref, w0_ref, w1_ref, w2_ref, w3_ref, err_ref, *,
                iters, radius, rounds):
    """Fused BC5: both channels' scalar searches in ONE program sharing the
    block loads (the reference's driver is one pass per block over two
    channels, amd_bc5_compressor.cpp:35-41)."""
    r = x_ref[0:16, 0].astype(F32) * 255.0
    g = x_ref[16:32, 0].astype(F32) * 255.0
    a0r, a1r, idxr, errr = _bc4_search(r, iters, radius, rounds)
    a0g, a1g, idxg, errg = _bc4_search(g, iters, radius, rounds)
    w0, w1 = _pack_dxt5(a0r, a1r, idxr)
    w2, w3 = _pack_dxt5(a0g, a1g, idxg)
    w0_ref[:] = w0
    w1_ref[:] = w1
    w2_ref[:] = w2
    w3_ref[:] = w3
    err_ref[:] = errr + errg


@partial(jax.jit, static_argnames=("iters", "radius", "rounds", "tile"))
def encode_bc4_blocks_pallas(vals01: jnp.ndarray, *, iters: int = 3,
                             radius: int = 2, rounds: int = 2,
                             tile: int = TILE):
    """(N,16) float scalar blocks in [0,1] -> ((N,2) uint32, (N,) err)."""
    n = vals01.shape[0]
    lane = min(tile, LANE)
    sub = max(tile // lane, 1)
    tile = sub * lane
    npad = -n % tile
    x = vals01.astype(F32)
    if npad:
        x = jnp.concatenate([x, jnp.zeros((npad, 16), F32)], axis=0)
    total = x.shape[0]
    grid = total // tile
    xt = x.T.reshape(16, grid, sub, lane)
    kern = partial(_bc4_kernel, iters=iters, radius=radius, rounds=rounds)
    interpret = jax.default_backend() == "cpu"
    w0, w1, err = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((16, 1, sub, lane), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((1, sub, lane), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)),
        out_shape=(
            jax.ShapeDtypeStruct((grid, sub, lane), U32),
            jax.ShapeDtypeStruct((grid, sub, lane), U32),
            jax.ShapeDtypeStruct((grid, sub, lane), F32),
        ),
        interpret=interpret,
    )(xt)
    words = jnp.stack([w0.reshape(total)[:n], w1.reshape(total)[:n]], axis=1)
    return words, err.reshape(total)[:n]


@partial(jax.jit, static_argnames=("iters", "radius", "rounds", "tile"))
def encode_bc5_blocks_pallas(blocks: jnp.ndarray, *, iters: int = 3,
                             radius: int = 2, rounds: int = 2,
                             tile: int = TILE):
    """Fused BC5: (N,16,C>=2) float blocks in [0,1] -> ((N,4) u32, (N,) err).

    One Pallas launch encodes both channels (R block then G block),
    sharing the VMEM-resident loads — vs two independent BC4 launches.
    """
    n = blocks.shape[0]
    lane = min(tile, LANE)
    sub = max(tile // lane, 1)
    tile = sub * lane
    npad = -n % tile
    x = blocks[..., :2].astype(F32)
    if npad:
        x = jnp.concatenate([x, jnp.zeros((npad, 16, 2), F32)], axis=0)
    total = x.shape[0]
    grid = total // tile
    xt = x.transpose(2, 1, 0).reshape(32, grid, sub, lane)
    kern = partial(_bc5_kernel, iters=iters, radius=radius, rounds=rounds)
    interpret = jax.default_backend() == "cpu"
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((32, 1, sub, lane), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((1, sub, lane), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(5)),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((grid, sub, lane), U32)] * 4
            + [jax.ShapeDtypeStruct((grid, sub, lane), F32)]),
        interpret=interpret,
    )(xt)
    words = jnp.stack([o.reshape(total)[:n] for o in outs[:4]], axis=1)
    return words, outs[4].reshape(total)[:n]

"""Full BC7 encoder: all 8 modes (AMD BC7BlockEncoder analog).

TPU-first redesign of amd_bc7_body.cpp's CompressBlock (:1289-1465):
the reference visits modes {6,4,3,1,2,0,7,5} with data-dependent early-outs
and per-mode partition sweeps + trace-table quantization + endpoint shakers;
here every enabled mode is evaluated for every block and a masked argmin
selects the winner (SURVEY.md §7 step 5: the early-outs become masking).

Replacements for the reference's heavyweight machinery (SURVEY.md §7 hard
parts 1-2):
  - the ~640 MB trace tables (amd_bc7_3dquant_vpc.cpp:35-124) are replaced
    by fixed-iteration least-squares fitting against the exact decode
    palette — the same fixed point optQuantAnD_d converges to
    (3dquant:1874-2045) without any tables;
  - the ~100 MB shake ramp tables (amd_shake.cpp:225-231) are replaced by
    recomputing ramps in-kernel: bit-replicated endpoint expansion + the
    64-weight lerp costs a few flops (amd_shake.cpp:254-297 semantics);
  - the partition sweep (bc7_body:582-643) becomes one vectorized
    bounds-axis estimate over the whole partition axis, then top-K exact
    fits (mirroring the sortProjection -> shake-top-N structure,
    bc7_body:643-709).

Quality maps to static budgets at trace time (partition shortlists, top-K,
refit rounds) like the encoder-ctor mapping amd_bc7_body.hpp:108-148.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables.bc7_tables import (BC7_MODES, WEIGHTS_BY_BITS, partition_table)
from .bc7_common import (_expand, pack_dual, pack_single, palette,
                         quantize_pbit, quantize_plain)
from .common import assign_nearest, fit_line_iterative, lsq_refit

F32 = jnp.float32
I32 = jnp.int32

LEVELS = {b: tuple(w / 64.0 for w in WEIGHTS_BY_BITS[b]) for b in (2, 3, 4)}


def _estimate_partitions_vec(pts, subsets: int, plist, levels: int):
    """Vectorized bounds-axis error estimate over the partition axis.

    pts (N,16,C) -> (N,P) estimated error. One shot instead of the
    reference's per-partition quantizer calls (bc7_body:582-643).
    """
    ptab = partition_table(subsets)[np.asarray(plist)]      # (P,16)
    onehot = np.zeros((len(plist), subsets, 16), np.float32)
    for p in range(len(plist)):
        for i in range(16):
            onehot[p, ptab[p, i], i] = 1.0
    oh = jnp.asarray(onehot)                                 # (P,S,16)
    cnt = jnp.maximum(oh.sum(-1), 1.0)                       # (P,S)
    mean = jnp.einsum("psi,nic->npsc", oh, pts) / cnt[None, :, :, None]
    mean_px = jnp.einsum("psi,npsc->npic", oh, mean)         # (N,P,16,C)
    r = pts[:, None] - mean_px                               # (N,P,16,C)
    big = jnp.float32(1e30)
    # per-subset bounds of residuals: loop subsets (S<=3 static) to keep the
    # peak tensor at (N,P,16,C) rather than (N,P,S,16,C)
    lo_l, hi_l = [], []
    for s in range(subsets):
        msk = oh[None, :, s, :, None] > 0                    # (1,P,16,1)
        lo_l.append(jnp.min(jnp.where(msk, r, big), axis=2))  # (N,P,C)
        hi_l.append(jnp.max(jnp.where(msk, r, -big), axis=2))
    lo = jnp.stack(lo_l, axis=2)                             # (N,P,S,C)
    hi = jnp.stack(hi_l, axis=2)
    axis = hi - lo                                           # (N,P,S,C)
    nrm = jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-6)
    axis = axis / nrm
    axis_px = jnp.einsum("psi,npsc->npic", oh, axis)
    t = jnp.sum(r * axis_px, axis=-1)                        # (N,P,16)
    tmin_l, tmax_l = [], []
    for s in range(subsets):
        msk = oh[None, :, s, :] > 0                          # (1,P,16)
        tmin_l.append(jnp.min(jnp.where(msk, t, big), axis=2))   # (N,P)
        tmax_l.append(jnp.max(jnp.where(msk, t, -big), axis=2))
    tmin = jnp.stack(tmin_l, axis=2)                         # (N,P,S)
    tmax = jnp.stack(tmax_l, axis=2)
    span = jnp.maximum(tmax - tmin, 1e-6)
    tmin_px = jnp.einsum("psi,nps->npi", oh, tmin)
    span_px = jnp.einsum("psi,nps->npi", oh, span)
    tq = jnp.round((t - tmin_px) / span_px * (levels - 1))
    tr = tq / (levels - 1) * span_px + tmin_px
    d2 = jnp.sum(r * r, axis=-1) - t * t                     # off-axis
    return jnp.sum(d2 + (t - tr) ** 2, axis=-1)              # (N,P)


def _estimate_partitions_pca(pts, subsets: int, plist, levels: int,
                             iters: int = 4):
    """Vectorized PCA-axis error estimate over the partition axis.

    Same contract as :func:`_estimate_partitions_vec` but the projection
    axis is a power-iterated principal eigenvector of the per-subset
    covariance instead of the residual bounding box. The bounds axis is a
    poor proxy on 4-channel alpha-gradient content — it misranks mode 7's
    partitions badly enough that the true best often misses even a top-24
    shortlist (r5 diag); the reference instead ranks all 64 partitions by
    actual quantizer error (bc7_body:582-643). PCA ranking recovers that
    ordering at a fraction of a full fit's cost.
    """
    ptab = partition_table(subsets)[np.asarray(plist)]      # (P,16)
    onehot = np.zeros((len(plist), subsets, 16), np.float32)
    for p in range(len(plist)):
        for i in range(16):
            onehot[p, ptab[p, i], i] = 1.0
    oh = jnp.asarray(onehot)                                 # (P,S,16)
    cnt = jnp.maximum(oh.sum(-1), 1.0)                       # (P,S)
    mean = jnp.einsum("psi,nic->npsc", oh, pts) / cnt[None, :, :, None]
    mean_px = jnp.einsum("psi,npsc->npic", oh, mean)         # (N,P,16,C)
    r = pts[:, None] - mean_px                               # (N,P,16,C)
    # per-subset covariance: mask residuals per subset, accumulate outer
    # products over pixels -> (N,P,S,C,C)
    r_s = r[:, :, None] * oh[None, :, :, :, None]            # (N,P,S,16,C)
    cov = jnp.einsum("npsic,npsid->npscd", r_s, r_s)
    v = jnp.ones(cov.shape[:-1], F32)                        # (N,P,S,C)
    for _ in range(iters):
        nv = jnp.einsum("npscd,npsd->npsc", cov, v)
        n = jnp.linalg.norm(nv, axis=-1, keepdims=True)
        v = jnp.where(n > 1e-8, nv / jnp.maximum(n, 1e-8), v)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    axis = v / jnp.maximum(n, 1e-8)
    axis_px = jnp.einsum("psi,npsc->npic", oh, axis)
    t = jnp.sum(r * axis_px, axis=-1)                        # (N,P,16)
    big = jnp.float32(1e30)
    tmin_l, tmax_l = [], []
    for s in range(subsets):
        msk = oh[None, :, s, :] > 0                          # (1,P,16)
        tmin_l.append(jnp.min(jnp.where(msk, t, big), axis=2))   # (N,P)
        tmax_l.append(jnp.max(jnp.where(msk, t, -big), axis=2))
    tmin = jnp.stack(tmin_l, axis=2)                         # (N,P,S)
    tmax = jnp.stack(tmax_l, axis=2)
    span = jnp.maximum(tmax - tmin, 1e-6)
    tmin_px = jnp.einsum("psi,nps->npi", oh, tmin)
    span_px = jnp.einsum("psi,nps->npi", oh, span)
    tq = jnp.round((t - tmin_px) / span_px * (levels - 1))
    tr = tq / (levels - 1) * span_px + tmin_px
    d2 = jnp.sum(r * r, axis=-1) - t * t                     # off-axis
    return jnp.sum(d2 + (t - tr) ** 2, axis=-1)              # (N,P)


def _pbit_combos(mode):
    if mode.pbit_mode == "per_endpoint":
        return ((0, 0), (0, 1), (1, 0), (1, 1))
    if mode.pbit_mode == "shared":
        return ((0, 0), (1, 1))
    return ((None, None),)


def _quant_channels(e0, e1, mode, p0, p1, chans):
    """Quantize all channels under one (p0, p1) choice -> (q0,q1,d0,d1)."""
    qs0, ds0, qs1, ds1 = [], [], [], []
    for c in range(chans):
        bits = mode.colour_bits if c < 3 else mode.alpha_bits
        if p0 is None:
            q0c, d0c = quantize_plain(e0[..., c], bits)
            q1c, d1c = quantize_plain(e1[..., c], bits)
        else:
            q0c, d0c = quantize_pbit(e0[..., c], bits, p0)
            q1c, d1c = quantize_pbit(e1[..., c], bits, p1)
        qs0.append(q0c)
        ds0.append(d0c)
        qs1.append(q1c)
        ds1.append(d1c)
    return (jnp.stack(qs0, -1), jnp.stack(qs1, -1),
            jnp.stack(ds0, -1), jnp.stack(ds1, -1))


def _pbit_analytic_choice(e0, e1, mode, chans):
    """Analytic p-bit selection by endpoint rounding error (the bc7enc16
    rule, richgel:606-708) — used in the partition RACE, where only the
    candidate ranking matters; the winner's shake re-races p-bits against
    the full palette (reference parity-vector enumeration analog)."""
    e0c = jnp.clip(e0, 0.0, 255.0)
    e1c = jnp.clip(e1, 0.0, 255.0)

    def perr(e, d):
        return jnp.sum((d.astype(F32) - e[..., :chans]) ** 2, axis=-1)

    if mode.pbit_mode == "per_endpoint":
        best = None
        for p0 in (0, 1):
            for p1 in (0, 1):
                q0, q1, d0, d1 = _quant_channels(e0c, e1c, mode, p0, p1,
                                                 chans)
                err = perr(e0c, d0) + perr(e1c, d1)
                cand = (err, q0, q1, d0, d1,
                        jnp.full(err.shape, p0, I32),
                        jnp.full(err.shape, p1, I32))
                if best is None:
                    best = cand
                else:
                    bt = cand[0] < best[0]
                    best = tuple(
                        jnp.where(bt.reshape(bt.shape + (1,) * (b.ndim - 1)),
                                  c, b)
                        for c, b in zip(cand, best))
        return best[1:]
    # shared
    best = None
    for p in (0, 1):
        q0, q1, d0, d1 = _quant_channels(e0c, e1c, mode, p, p, chans)
        err = perr(e0c, d0) + perr(e1c, d1)
        cand = (err, q0, q1, d0, d1, jnp.full(err.shape, p, I32),
                jnp.full(err.shape, p, I32))
        if best is None:
            best = cand
        else:
            bt = cand[0] < best[0]
            best = tuple(
                jnp.where(bt.reshape(bt.shape + (1,) * (b.ndim - 1)), c, b)
                for c, b in zip(cand, best))
    return best[1:]


def _quant_subset(pts, m, mode, e0, e1, weights, analytic: bool = False,
                  pbit_race: int = 1):
    """Quantize one subset's float endpoints; exact palette evaluation.

    ``analytic``: choose p-bits by endpoint rounding error (one palette
    eval) instead of racing every combo — used inside the partition race.
    ``pbit_race=2`` (with analytic) races the TOP-2 combos by endpoint
    rounding error against the exact palette — for mode 0's 4-bit
    endpoints the 1-combo analytic choice misjudges the interpolated
    palette, while the full 4-combo race is ~2x the quantize cost for
    the same measured PSNR (scripts/diag_m0_exp.py r4).
    Returns (err, q0, q1, p0, p1, idx)."""
    n = pts.shape[0]
    chans = pts.shape[-1]
    if analytic and mode.pbit_mode != "none" and pbit_race > 1:
        e0c = jnp.clip(e0, 0.0, 255.0)
        e1c = jnp.clip(e1, 0.0, 255.0)
        combos = _pbit_combos(mode)
        errs, packs = [], []
        for p0, p1 in combos:
            q0, q1, d0, d1 = _quant_channels(e0c, e1c, mode, p0, p1, chans)
            pe = (jnp.sum((d0.astype(F32) - e0c[..., :chans]) ** 2, -1)
                  + jnp.sum((d1.astype(F32) - e1c[..., :chans]) ** 2, -1))
            errs.append(pe)
            packs.append((q0, q1, d0, d1,
                          jnp.full(pe.shape, p0, I32),
                          jnp.full(pe.shape, p1, I32)))
        # sequential top-2 by rounding error (ties -> earlier combo, the
        # Pallas mirror's demote order)
        big = jnp.float32(3.4e38)
        e_sorted = list(errs)
        best = None
        for _rank in range(min(pbit_race, len(combos))):
            sel = jnp.zeros_like(errs[0], I32)
            cur = e_sorted[0]
            for ci in range(1, len(combos)):
                take = e_sorted[ci] < cur
                cur = jnp.where(take, e_sorted[ci], cur)
                sel = jnp.where(take, ci, sel)
            e_sorted = [jnp.where(sel == ci, big, e_sorted[ci])
                        for ci in range(len(combos))]
            pick = []
            for t_i in range(6):
                acc = packs[0][t_i]
                for ci in range(1, len(combos)):
                    c = packs[ci][t_i]
                    tk = (sel == ci).reshape(
                        sel.shape + (1,) * (c.ndim - sel.ndim))
                    acc = jnp.where(tk, c, acc)
                pick.append(acc)
            q0, q1, d0, d1, pv0, pv1 = pick
            pal = palette(d0, d1, mode.index_bits)
            idx, err = assign_nearest(pts, pal, weights, m)
            cand = (err, q0, q1, pv0, pv1, idx)
            if best is None:
                best = cand
            else:
                bt = cand[0] < best[0]
                best = tuple(
                    jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), c, b)
                    for c, b in zip(cand, best))
        return best
    if analytic and mode.pbit_mode != "none":
        q0, q1, d0, d1, pv0, pv1 = _pbit_analytic_choice(e0, e1, mode, chans)
        pal = palette(d0, d1, mode.index_bits)
        idx, err = assign_nearest(pts, pal, weights, m)
        return err, q0, q1, pv0, pv1, idx
    best = None
    for p0, p1 in _pbit_combos(mode):
        q0, q1, d0, d1 = _quant_channels(e0, e1, mode, p0, p1, chans)
        pal = palette(d0, d1, mode.index_bits)
        idx, err = assign_nearest(pts, pal, weights, m)
        pv0 = jnp.full((n,), 0 if p0 is None else p0, I32)
        pv1 = jnp.full((n,), 0 if p1 is None else p1, I32)
        cand = (err, q0, q1, pv0, pv1, idx)
        if best is None:
            best = cand
        else:
            bt = cand[0] < best[0]
            best = tuple(
                jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), c, b)
                for c, b in zip(cand, best))
    return best


def _shake_deltas(r: int):
    """(dlo, dhi) sweep offsets for the shake cube; the reference scales the
    cube with quality (amd_shake.cpp:898-944) — range 1 below max quality,
    range 2 at max."""
    return tuple((a, b) for a in range(-r, r + 1) for b in range(-r, r + 1)
                 if (a, b) != (0, 0))


def _deq_channel(q, p, bits: int, has_p: bool):
    if has_p:
        return _expand((q << 1) | p, bits + 1)
    return _expand(q, bits)


def _shake_subset(pts, m, mode, q0, q1, p0, p1, idx, err, weights,
                  rounds: int, srange: int = 1):
    """Quantized-space endpoint shaker — ep_shaker_2_d's shake-cube analog
    (amd_shake.cpp:898-1044) as fixed-shape sweeps.

    Holds the current index assignment fixed and sweeps each channel's
    endpoint code pair over a +-1 cube (the reference sweeps a
    quality-scaled cube per channel with the same fixed cidx, :923-945),
    picks the per-channel argmin, re-races the p-bit combination, then
    requantizes the indices against the decoded ramp (:980-1018) and
    iterates.  All candidate evaluation is against the exact decode palette,
    so the error is decode-true at every step.

    pts (N,16,C); m (N,16) subset mask; q0/q1 (N,C) component codes
    (pbit excluded); p0/p1 (N,) pbit values; idx (N,16) current indices.
    Returns (err, q0, q1, p0, p1, idx).
    """
    chans = pts.shape[-1]
    has_p = mode.pbit_mode != "none"
    wtab = jnp.asarray(WEIGHTS_BY_BITS[mode.index_bits], I32)
    for _ in range(rounds):
        wk = wtab[idx]                                    # (N,16)
        for c in range(chans):
            bits = mode.colour_bits if c < 3 else mode.alpha_bits
            maxq = (1 << bits) - 1
            q0c = q0[..., c]
            q1c = q1[..., c]
            deq0 = _deq_channel(q0c, p0, bits, has_p)
            deq1 = _deq_channel(q1c, p1, bits, has_p)
            ramp = (deq0[:, None] * (64 - wk) + deq1[:, None] * wk + 32) >> 6
            best_e = jnp.sum(m * (ramp.astype(F32) - pts[..., c]) ** 2,
                             axis=-1)
            best_q0c, best_q1c = q0c, q1c
            for d0, d1 in _shake_deltas(srange):
                nq0 = jnp.clip(q0c + d0, 0, maxq)
                nq1 = jnp.clip(q1c + d1, 0, maxq)
                deq0 = _deq_channel(nq0, p0, bits, has_p)
                deq1 = _deq_channel(nq1, p1, bits, has_p)
                ramp = (deq0[:, None] * (64 - wk) + deq1[:, None] * wk
                        + 32) >> 6
                e = jnp.sum(m * (ramp.astype(F32) - pts[..., c]) ** 2,
                            axis=-1)
                bt = e < best_e
                best_e = jnp.where(bt, e, best_e)
                best_q0c = jnp.where(bt, nq0, best_q0c)
                best_q1c = jnp.where(bt, nq1, best_q1c)
            q0 = q0.at[..., c].set(best_q0c)
            q1 = q1.at[..., c].set(best_q1c)
        # p-bit re-race + index requantize against the exact palette
        combos = (((0, 0), (0, 1), (1, 0), (1, 1))
                  if mode.pbit_mode == "per_endpoint" else
                  ((0, 0), (1, 1)) if mode.pbit_mode == "shared"
                  else ((None, None),))
        best = None
        for c0, c1 in combos:
            np0 = p0 if c0 is None else jnp.full_like(p0, c0)
            np1 = p1 if c1 is None else jnp.full_like(p1, c1)
            d0 = jnp.stack(
                [_deq_channel(q0[..., c], np0,
                              mode.colour_bits if c < 3 else mode.alpha_bits,
                              has_p) for c in range(chans)], -1)
            d1 = jnp.stack(
                [_deq_channel(q1[..., c], np1,
                              mode.colour_bits if c < 3 else mode.alpha_bits,
                              has_p) for c in range(chans)], -1)
            pal = palette(d0, d1, mode.index_bits)
            nidx, ne = assign_nearest(pts, pal, weights, m)
            cand = (ne, np0, np1, nidx)
            if best is None:
                best = cand
            else:
                bt = cand[0] < best[0]
                n = pts.shape[0]
                best = tuple(
                    jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), cc, b)
                    for cc, b in zip(cand, best))
        err, p0, p1, idx = best
    return err, q0, q1, p0, p1, idx


def _deq_endpoints(q0, q1, p0, p1, mode, chans):
    """Dequantize per-subset endpoint codes -> float (N,C) pairs."""
    has_p = mode.pbit_mode != "none"
    d0l, d1l = [], []
    for c in range(chans):
        bits = mode.colour_bits if c < 3 else mode.alpha_bits
        d0l.append(_deq_channel(q0[..., c], p0, bits, has_p))
        d1l.append(_deq_channel(q1[..., c], p1, bits, has_p))
    return (jnp.stack(d0l, -1).astype(F32), jnp.stack(d1l, -1).astype(F32))


def _uber_subset(pts, m, mode, q0, q1, p0, p1, idx, err, weights,
                 uber: int, pbit_race: int = 1):
    """Selector-variant refit rounds on one subset — the bc7enc16 uber
    machinery (richgel999_bc7enc16.cpp:896-1006) grafted onto the AMD
    search: each +-1 perturbation / scaling extrapolation of the current
    indices is least-squares refit and requantized, keeping any win. This
    plays the role of the trace-quantizer's long AnD iteration
    (amd_bc7_3dquant_vpc.cpp:1874-2045) at fixed cost.

    ep_shaker_d's index collapse+(q,p) stretch sweep (amd_shake.cpp:
    513-529, :820-828) was implemented here and measured at +0.00 dB on
    the quality corpus for ~3x the mode-0 cost (r4) — the scaling
    extrapolations above already cover the useful remappings — so the
    refinement budget goes to the top-2 partition race instead
    (encode_single_mode keep2).

    Returns (err, q0, q1, p0, p1, idx)."""
    from .bc7_fast import _sel_variants
    lv = jnp.asarray(LEVELS[mode.index_bits], F32)
    max_sel = (1 << mode.index_bits) - 1
    chans = pts.shape[-1]
    d0, d1 = _deq_endpoints(q0, q1, p0, p1, mode, chans)
    mi = m > 0
    big = jnp.int32(1 << 20)
    mn = jnp.min(jnp.where(mi, idx, big), axis=1, keepdims=True)
    mx = jnp.max(jnp.where(mi, idx, -big), axis=1, keepdims=True)
    best = (err, q0, q1, p0, p1, idx)
    n = pts.shape[0]
    for v in _sel_variants(idx, mn, mx, max_sel, uber):
        e0v, e1v = lsq_refit(pts, m, lv[v], d0, d1)
        cand = _quant_subset(pts, m, mode, e0v, e1v, weights,
                             analytic=True, pbit_race=pbit_race)
        bt = cand[0] < best[0]
        best = tuple(
            jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), c, b)
            for c, b in zip(cand, best))
    return best


def encode_single_mode(pts, mode, weights, plist, topk: int, iters: int = 2,
                       shake_rounds: int = 0, uber: int = 0,
                       cand_parts=None):
    """Generic single-index mode encoder (modes 0,1,2,3,6,7).

    pts (N,16,C) with C=4 iff mode has alpha endpoints, else C=3.
    ``cand_parts``: optional precomputed (N,K) top-k partition ids — the
    shared estimate reused across modes with equal subset count (the
    reference's sortProjection-once structure, bc7_body:643-709).
    Returns (err, words).
    """
    n = pts.shape[0]
    s_count = mode.subsets
    levels = LEVELS[mode.index_bits]
    if s_count == 1:
        parts = jnp.zeros((n,), I32)
        cand_parts = parts[:, None]
        topk = 1
    elif cand_parts is not None:
        topk = cand_parts.shape[1]
    else:
        est = _estimate_partitions_vec(pts, s_count, plist,
                                       1 << mode.index_bits)
        k = min(topk, len(plist))
        _, top = jax.lax.top_k(-est, k)
        cand_parts = jnp.asarray(plist, I32)[top]            # (N,K)
        topk = k
    ptab = jnp.asarray(partition_table(s_count))
    # top-2 race for low-precision endpoints (<=5 bits): there the pre-
    # refinement ranking is noisy, and the reference shakes EVERY sorted
    # candidate before picking (bc7_body:643-709 numShakeAttempts), so
    # refining only the pre-shake argmin loses the post-shake winner
    # (measured r4: bc7_full_q1 -0.035 -> -0.015 dB from mode-0 keep2).
    keep2 = (mode.colour_bits <= 5 and s_count >= 2 and topk > 1
             and (uber or shake_rounds))
    # mode 0's 4-bit + per-endpoint-pbit endpoints: the analytic p-bit
    # choice (endpoint rounding error) misjudges the interpolated palette
    # so race + uber requant race the top-2 combos exactly, and the
    # selector scale family gets two extra levels — together these closed
    # ~93% of the measured mode-0 deficit vs the reference on the 4k
    # corpus (scripts/diag_m0_exp.py, r4: +70141 SSE -> ~+5k).
    low4 = mode.colour_bits <= 4 and mode.pbit_mode != "none"
    pbit_race = 2 if low4 else 1
    if low4 and uber:
        uber = uber + 2
    best = None
    best2 = None
    for kk in range(topk):
        part = cand_parts[:, kk]
        sub = ptab[part]
        errl, q0l, q1l, p0l, p1l = [], [], [], [], []
        idx_all = jnp.zeros((n, 16), I32)
        for s in range(s_count):
            m = (sub == s).astype(F32)
            e0, e1 = fit_line_iterative(pts, m, levels, iters, weights)
            err, q0, q1, p0, p1, idx = _quant_subset(
                pts, m, mode, e0, e1, weights, analytic=True,
                pbit_race=pbit_race)
            errl.append(err)
            q0l.append(q0)
            q1l.append(q1)
            p0l.append(p0)
            p1l.append(p1)
            idx_all = jnp.where(sub == s, idx, idx_all)
        cand = (sum(errl), jnp.stack(errl, 1), part, jnp.stack(q0l, 1),
                jnp.stack(q1l, 1), jnp.stack(p0l, 1), jnp.stack(p1l, 1),
                idx_all)
        if best is None:
            best = cand
        else:
            bt = cand[0] < best[0]

            def sel(t, a, b):
                return tuple(
                    jnp.where(t.reshape((n,) + (1,) * (x.ndim - 1)), x, y)
                    for x, y in zip(a, b))

            if keep2:
                demoted = sel(bt, best, cand)      # loser of (cand, best)
                best = sel(bt, cand, best)
                if best2 is None:
                    best2 = demoted
                else:
                    b2 = demoted[0] < best2[0]
                    best2 = sel(b2, demoted, best2)
            else:
                best = sel(bt, cand, best)

    def _refine(state):
        total, errs, part, q0, q1, pb0, pb1, idx = state
        sub = ptab[part]
        for s in range(s_count):
            m = (sub == s).astype(F32)
            err_s, q0s, q1s, p0s, p1s, idx_s = (
                errs[:, s], q0[:, s], q1[:, s], pb0[:, s], pb1[:, s], idx)
            if uber:
                err_s, q0s, q1s, p0s, p1s, idx_s = _uber_subset(
                    pts, m, mode, q0s, q1s, p0s, p1s, idx_s, err_s,
                    weights, uber, pbit_race=pbit_race)
            if shake_rounds:
                err_s, q0s, q1s, p0s, p1s, idx_s = _shake_subset(
                    pts, m, mode, q0s, q1s, p0s, p1s, idx_s, err_s,
                    weights, shake_rounds,
                    srange=2 if shake_rounds >= 3 else 1)
            errs = errs.at[:, s].set(err_s)
            q0 = q0.at[:, s].set(q0s)
            q1 = q1.at[:, s].set(q1s)
            pb0 = pb0.at[:, s].set(p0s)
            pb1 = pb1.at[:, s].set(p1s)
            idx = jnp.where(sub == s, idx_s, idx)
        return (jnp.sum(errs, axis=1), errs, part, q0, q1, pb0, pb1, idx)

    if uber or shake_rounds:
        # refine + shake the winning partition's subsets (and the runner-
        # up for low-bit modes), pick the post-refinement argmin
        best = _refine(best)
        if keep2:
            ref2 = _refine(best2)
            bt = ref2[0] < best[0]
            best = tuple(
                jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), c, b)
                for c, b in zip(ref2, best))
    total, errs, part, q0, q1, pb0, pb1, idx = best

    if pts.shape[-1] == 3 and mode.alpha_bits:
        raise AssertionError("alpha mode needs 4-channel pts")
    words = pack_single(mode, part, q0, q1, pb0, pb1, idx)
    return total, words


def _fit_scalar(vals, bits: int, index_bits: int, iters: int = 2):
    """Scalar (alpha) channel fit for dual modes: LSQ + exact evaluation.

    vals (N,16) in 0..255 -> (err, q0, q1, idx)."""
    levels = jnp.asarray(LEVELS[index_bits], F32)
    e0 = jnp.min(vals, axis=-1)
    e1 = jnp.max(vals, axis=-1)
    for _ in range(iters):
        pal = e0[:, None] + levels[None, :] * (e1 - e0)[:, None]
        d = vals[:, :, None] - pal[:, None, :]
        idx = jnp.argmin(d * d, axis=-1)
        a = levels[idx]
        q00 = jnp.sum((1 - a) ** 2, -1)
        q01 = jnp.sum(a * (1 - a), -1)
        q11 = jnp.sum(a * a, -1)
        b0 = jnp.sum((1 - a) * vals, -1)
        b1 = jnp.sum(a * vals, -1)
        det = q00 * q11 - q01 * q01
        ok = jnp.abs(det) > 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        ne0 = (q11 * b0 - q01 * b1) * inv
        ne1 = (q00 * b1 - q01 * b0) * inv
        e0 = jnp.where(ok, ne0, e0)
        e1 = jnp.where(ok, ne1, e1)
    q0, d0 = quantize_plain(e0, bits)
    q1, d1 = quantize_plain(e1, bits)
    w = jnp.asarray(WEIGHTS_BY_BITS[index_bits], I32)
    pal = (d0[:, None] * (64 - w)[None, :] + d1[:, None] * w[None, :]
           + 32) >> 6
    d = vals[:, :, None] - pal[:, None, :].astype(F32)
    idx = jnp.argmin(d * d, axis=-1).astype(I32)
    err = jnp.sum(jnp.min(d * d, axis=-1), axis=-1)
    return err, q0, q1, idx


class _SubMode:
    """Lightweight mode view for _shake_subset on dual-mode channel groups."""

    def __init__(self, colour_bits, alpha_bits, index_bits, pbit_mode):
        self.colour_bits = colour_bits
        self.alpha_bits = alpha_bits
        self.index_bits = index_bits
        self.pbit_mode = pbit_mode


def _uber_scalar(vals, bits: int, index_bits: int, qa0, qa1, aidx, aerr,
                 uber: int):
    """Uber selector rounds for a dual-mode scalar (alpha) channel: each
    selector variant is LSQ-refit, requantized and exactly re-assigned —
    the scalar-side counterpart of _uber_dual_colour (the reference's
    dual path runs its full shaker on the scalar block too,
    amd_bc7_body.cpp:1161-1239)."""
    from .bc7_fast import _sel_variants
    lv = jnp.asarray(LEVELS[index_bits], F32)
    max_sel = (1 << index_bits) - 1
    w = jnp.asarray(WEIGHTS_BY_BITS[index_bits], I32)
    mn = jnp.min(aidx, axis=1, keepdims=True)
    mx = jnp.max(aidx, axis=1, keepdims=True)
    best = (aerr, qa0, qa1, aidx)
    n = vals.shape[0]
    for v in _sel_variants(aidx, mn, mx, max_sel, uber):
        a = lv[v]
        q00 = jnp.sum((1 - a) ** 2, -1)
        q01 = jnp.sum(a * (1 - a), -1)
        q11 = jnp.sum(a * a, -1)
        b0 = jnp.sum((1 - a) * vals, -1)
        b1 = jnp.sum(a * vals, -1)
        det = q00 * q11 - q01 * q01
        ok = jnp.abs(det) > 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        e0 = (q11 * b0 - q01 * b1) * inv
        e1 = (q00 * b1 - q01 * b0) * inv
        q0, d0 = quantize_plain(jnp.where(ok, e0, 0.0), bits)
        q1, d1 = quantize_plain(jnp.where(ok, e1, 255.0), bits)
        pal = (d0[:, None] * (64 - w)[None, :] + d1[:, None] * w[None, :]
               + 32) >> 6
        d = vals[:, :, None] - pal[:, None, :].astype(F32)
        idx = jnp.argmin(d * d, axis=-1).astype(I32)
        err = jnp.sum(jnp.min(d * d, axis=-1), axis=-1)
        cand = (err, q0, q1, idx)
        bt = cand[0] < best[0]
        best = tuple(
            jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), c, b)
            for c, b in zip(cand, best))
    return best


def _uber_dual_colour(rgb, mask, cbits: int, ibits: int, qc0, qc1, cidx,
                      cerr, weights3, uber: int):
    """Uber selector rounds for a dual-mode RGB fit (no p-bits)."""
    from .bc7_fast import _sel_variants
    lv = jnp.asarray(LEVELS[ibits], F32)
    max_sel = (1 << ibits) - 1
    n = rgb.shape[0]
    d0 = _expand(qc0, cbits).astype(F32)
    d1 = _expand(qc1, cbits).astype(F32)
    mn = jnp.min(cidx, axis=1, keepdims=True)
    mx = jnp.max(cidx, axis=1, keepdims=True)
    best = (cerr, qc0, qc1, cidx)
    for v in _sel_variants(cidx, mn, mx, max_sel, uber):
        e0, e1 = lsq_refit(rgb, mask, lv[v], d0, d1)
        qs0, ds0, qs1, ds1 = [], [], [], []
        for c in range(3):
            q0c, d0c = quantize_plain(e0[..., c], cbits)
            q1c, d1c = quantize_plain(e1[..., c], cbits)
            qs0.append(q0c)
            ds0.append(d0c)
            qs1.append(q1c)
            ds1.append(d1c)
        pal = palette(jnp.stack(ds0, -1), jnp.stack(ds1, -1), ibits)
        idx, err = assign_nearest(rgb, pal, weights3, mask)
        cand = (err, jnp.stack(qs0, -1), jnp.stack(qs1, -1), idx)
        bt = cand[0] < best[0]
        best = tuple(
            jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), c, b)
            for c, b in zip(cand, best))
    return best


# channel permutation per rotation (swap channel rot-1 with alpha)
_ROT_PERMS = ((0, 1, 2, 3), (3, 1, 2, 0), (0, 3, 2, 1), (0, 1, 3, 2))


def _refine_dual(pts, mode, w4, cand, shake_rounds: int, uber: int,
                 mask, zeros):
    """Refine one dual-mode candidate tuple: gather its rotation's permuted
    points, run uber + shake on each static sel path, lane-select."""
    err, cerr, aerr, rot, sel, qc0, qc1, qa0, qa1, cidx, aidx = cand
    perm = jnp.asarray(_ROT_PERMS, I32)[rot]               # (N,4)
    p = jnp.take_along_axis(pts, perm[:, None, :], axis=2)
    rgb, alpha = p[..., :3], p[..., 3]
    w3 = w4[:3]
    for sv in range(1 << mode.index_mode_bits):
        in_sel = (sel == sv) if mode.index_mode_bits else (sel == sel)
        cbits_idx = mode.index_bits2 if sv else mode.index_bits
        abits_idx = mode.index_bits if sv else mode.index_bits2
        cerr_v, qc0v, qc1v, cidx_v = cerr, qc0, qc1, cidx
        aerr_u, qa0_u, qa1_u, aidx_u = aerr, qa0, qa1, aidx
        if uber:
            cerr_v, qc0v, qc1v, cidx_v = _uber_dual_colour(
                rgb, mask, mode.colour_bits, cbits_idx, qc0v, qc1v,
                cidx_v, cerr_v, w3, min(uber, 2))
            aerr_u, qa0_u, qa1_u, aidx_u = _uber_scalar(
                alpha, mode.alpha_bits, abits_idx, qa0, qa1, aidx, aerr,
                min(uber, 2))
        if shake_rounds:
            srange = 1   # r5: srange=2 for duals measured +0.000 dB
            cmode = _SubMode(mode.colour_bits, 0, cbits_idx, "none")
            cerr_v, qc0v, qc1v, _, _, cidx_v = _shake_subset(
                rgb, mask, cmode, qc0v, qc1v, zeros, zeros, cidx_v,
                cerr_v, w3, shake_rounds, srange=srange)
            amode = _SubMode(mode.alpha_bits, 0, abits_idx, "none")
            aerr_v, qa0v, qa1v, _, _, aidx_v = _shake_subset(
                alpha[..., None], mask, amode, qa0_u[..., None],
                qa1_u[..., None], zeros, zeros, aidx_u, aerr_u,
                jnp.ones((1,), F32), shake_rounds, srange=srange)
            qa0v, qa1v = qa0v[..., 0], qa1v[..., 0]
        else:
            aerr_v, qa0v, qa1v, aidx_v = aerr_u, qa0_u, qa1_u, aidx_u
        gain = (cerr_v + aerr_v * w4[3]) < (cerr + aerr * w4[3])
        tk = in_sel & gain
        cerr = jnp.where(tk, cerr_v, cerr)
        aerr = jnp.where(tk, aerr_v, aerr)
        qc0 = jnp.where(tk[:, None], qc0v, qc0)
        qc1 = jnp.where(tk[:, None], qc1v, qc1)
        qa0 = jnp.where(tk, qa0v, qa0)
        qa1 = jnp.where(tk, qa1v, qa1)
        cidx = jnp.where(tk[:, None], cidx_v, cidx)
        aidx = jnp.where(tk[:, None], aidx_v, aidx)
    err = cerr + aerr * w4[3]
    return (err, cerr, aerr, rot, sel, qc0, qc1, qa0, qa1, cidx, aidx)


def encode_dual_mode(pts, mode, weights, shake_rounds: int = 0,
                     uber: int = 0, keep: int = 1, iters: int = 2):
    """Modes 4/5: rotation race x index-selection race x separate RGB +
    scalar alpha fits; the uber selector rounds and the quantized-space
    shaker run on the top-``keep`` (rot, sel) candidates. The reference
    shakes EVERY candidate above the HIGH threshold
    (amd_bc7_body.cpp:1153-1239: the quantizer-error gate is bypassed at
    quality > 0.7), so the pre-refinement ranking can miss the post-shake
    winner; keep=2 recovers most of that at 2x (not 8x) the refine cost.

    pts (N,16,4) 0..255. CompressDualIndexBlock analog
    (amd_bc7_body.cpp:1059-1278) including the mode-4 ``indexSelection``
    axis (:1099-1127): idx_mode==1 gives colour the 3-bit index set and
    alpha the 2-bit set. Refinement assumes permutation-invariant
    channel weights (the driver always passes uniform weights).
    Returns (err, words).
    """
    n = pts.shape[0]
    w4 = jnp.asarray(weights, F32)
    zeros = jnp.zeros((n,), I32)
    mask = jnp.ones((n, 16), F32)
    keep_n = keep if (uber or shake_rounds) else 1
    slots = []   # per-block top-keep_n candidates, best first

    def sel_t(t, a, b):
        return tuple(
            jnp.where(t.reshape((n,) + (1,) * (x.ndim - 1)), x, y)
            for x, y in zip(a, b))

    for rot in range(4):
        perm = list(_ROT_PERMS[rot])
        p = pts[..., perm]
        wp = w4[jnp.asarray(perm)]
        rgb, alpha = p[..., :3], p[..., 3]
        for sel in range(1 << mode.index_mode_bits):
            cbits_idx = mode.index_bits2 if sel else mode.index_bits
            abits_idx = mode.index_bits if sel else mode.index_bits2
            e0, e1 = fit_line_iterative(rgb, mask, LEVELS[cbits_idx],
                                        iters, wp[:3])
            qs0, ds0, qs1, ds1 = [], [], [], []
            for c in range(3):
                q0c, d0c = quantize_plain(e0[..., c], mode.colour_bits)
                q1c, d1c = quantize_plain(e1[..., c], mode.colour_bits)
                qs0.append(q0c)
                ds0.append(d0c)
                qs1.append(q1c)
                ds1.append(d1c)
            qc0 = jnp.stack(qs0, -1)
            qc1 = jnp.stack(qs1, -1)
            pal = palette(jnp.stack(ds0, -1), jnp.stack(ds1, -1), cbits_idx)
            cidx, cerr = assign_nearest(rgb, pal, wp[:3], mask)
            aerr, qa0, qa1, aidx = _fit_scalar(alpha, mode.alpha_bits,
                                               abits_idx, iters=iters)
            err = cerr + aerr * wp[3]
            cand = (err, cerr, aerr, jnp.full((n,), rot, I32),
                    jnp.full((n,), sel, I32), qc0, qc1, qa0, qa1,
                    cidx, aidx)
            # bubble-insert into the per-block top-keep_n slots
            for i in range(len(slots)):
                bt = cand[0] < slots[i][0]
                new_i = sel_t(bt, cand, slots[i])
                cand = sel_t(bt, slots[i], cand)
                slots[i] = new_i
            if len(slots) < keep_n:
                slots.append(cand)

    best = slots[0]
    if uber or shake_rounds:
        best = _refine_dual(pts, mode, w4, best, shake_rounds, uber,
                            mask, zeros)
        for s in slots[1:]:
            ref = _refine_dual(pts, mode, w4, s, shake_rounds, uber,
                               mask, zeros)
            bt = ref[0] < best[0]
            best = sel_t(bt, ref, best)

    err, cerr, aerr, rot, sel, qc0, qc1, qa0, qa1, cidx, aidx = best
    f1idx = jnp.where((sel == 1)[:, None], aidx, cidx)
    f2idx = jnp.where((sel == 1)[:, None], cidx, aidx)
    words = pack_dual(mode, rot, sel, qc0, qc1, qa0, qa1, f1idx, f2idx)
    return err, words


def _combined_alpha_bar(blocks, pts, colour_restrict: bool,
                        alpha_restrict: bool):
    """Per-block mask barring the COMBINED_ALPHA modes (6, 7) — the
    reference's mode restriction scan (amd_bc7_body.cpp:1312-1380):

      - colourRestrict: an opaque, non-solid block must not use a
        colour+alpha mode (parity could make it slightly transparent);
      - alphaRestrict: a block with thresholded (0/1) alpha must not use
        a colour+alpha mode (punch-through safety).

    Returns (N,) bool, True where modes 6/7 are barred.
    """
    a = blocks[..., 3]
    needs_alpha = jnp.any(a < 1.0, axis=1)
    zero_one = jnp.any((a >= 0.99999) | (a < 0.00001), axis=1)
    rng = jnp.max(pts, axis=1) - jnp.min(pts, axis=1)        # (N,4)
    solid = jnp.max(rng, axis=-1) < 1e-10
    bar = jnp.zeros(needs_alpha.shape, bool)
    if colour_restrict:
        bar = bar | (~solid & ~needs_alpha)
    if alpha_restrict:
        bar = bar | (needs_alpha & zero_one)
    return bar


def _budgets(quality: float):
    """quality -> (partition shortlist len, topk, fit iters, shake rounds,
    uber level). Mirrors the FAST/HIGHQUALITY threshold mapping
    (amd_bc7_body.cpp:258-262, hpp:108-148) as static trace-time budgets;
    shake rounds play the role of the reference's numShakeAttempts/maxTry
    iteration (bc7_body:695-709) and the uber level the role of the
    trace-quantizer's AnD refinement depth (amd_bc7_3dquant_vpc.cpp:30,
    maxTry ~ 4000*quality)."""
    if quality <= 0.25:
        return 16, 1, 1, 0, 0
    if quality <= 0.5:
        return 32, 2, 2, 1, 1
    if quality <= 0.75:
        return 64, 3, 2, 1, 2
    # topk 8 = the reference's numShakeAttempts = 8 * quality at 1.0
    return 64, 8, 3, 3, 4


@partial(jax.jit, static_argnames=("quality", "mode_mask", "src_has_alpha",
                                  "colour_restrict", "alpha_restrict",
                                  "performance"))
def encode_bc7_blocks(blocks: jnp.ndarray, *, quality: float = 1.0,
                      mode_mask: int = 0xFF, src_has_alpha: bool = True,
                      colour_restrict: bool = True,
                      alpha_restrict: bool = True,
                      performance: float = 1.0):
    """Encode (N,16,4) float RGBA blocks in [0,1] -> ((N,4) uint32, (N,) err).

    Image_CompressAMDMultiModeLDRBlock analog (amd_bc7_compressor.cpp:11-23).
    Every enabled mode is evaluated; opaque-only modes (0-3) pay the true
    alpha penalty on non-opaque blocks so the argmin prunes them naturally;
    the COMBINED_ALPHA restrictions (colour_restrict / alpha_restrict,
    bc7_body:1312-1380) bar modes 6/7 per block via error masking.
    """
    pts = blocks.astype(F32) * 255.0
    n = pts.shape[0]
    w = (1.0, 1.0, 1.0, 1.0)
    # ``performance`` < 1 routes the reference's high-range blocks to its
    # OPTIMAL trace-table quantizer (blockMaxRange > 255*perf,
    # amd_bc7_body.cpp:606-630) — i.e. lower performance RAISES reference
    # quality. This framework has one quantizer, so parity is bought with
    # search effort: lift the budget tier to max(quality, 1-perf) and add
    # one top-k slot. Mapping measured against the trace-equipped oracle
    # on the bc7_full_p0.3 matrix row (scripts/diag_bc7_perf.py: the
    # shipped tier closes -0.116 dB to >= +0.04).
    perf = min(max(performance, 0.0), 1.0)
    q_eff = max(quality, 1.0 - perf) if perf < 1.0 else quality
    nparts, topk, iters, shake, uber = _budgets(q_eff)
    if perf < 1.0:
        topk += 1
    plist = tuple(range(nparts))
    plist16 = tuple(range(min(nparts, 16)))

    alpha_pen = jnp.sum((pts[..., 3] - 255.0) ** 2, axis=-1)
    combined_bar = _combined_alpha_bar(blocks, pts, colour_restrict,
                                       alpha_restrict)

    # ---- shared partition estimation: one vectorized pass per
    # (subsets, channels) group, reused by every mode in the group
    def _top_parts(p, subsets, pl, levels, k, estimator="bounds"):
        from .common import map_ids as _map_ids
        fn = (_estimate_partitions_pca if estimator == "pca"
              else _estimate_partitions_vec)
        est = fn(p, subsets, pl, levels)
        k = min(k, len(pl))
        _, top = jax.lax.top_k(-est, k)
        return _map_ids(top, pl)                             # (N,K)

    cand = {}
    if mode_mask & 0x0A:                                     # modes 1, 3
        cand[1] = cand[3] = _top_parts(pts[..., :3], 2, plist, 8, topk)
    if mode_mask & 0x80:                                     # mode 7
        # PCA-ranked shortlist: the bounds-axis estimator misranks
        # 4-channel alpha-gradient blocks badly enough that the true best
        # partition often missed even a top-24 (r5 per-mode diag: mode 7
        # carried the WHOLE bc7_full_alpha deficit); the reference ranks
        # all 64 by exact quantizer error (bc7_body:582-643). A PCA axis
        # holds the reference winner in the top-8 ~99% of the time
        # (scripts/diag_mode7_rank.py) at a fraction of a full fit's
        # cost, so the x24 widening is gone. Alpha-only cost: the
        # all-opaque runtime skip means opaque content never runs mode 7.
        cand[7] = _top_parts(pts, 2, plist, 4, topk, estimator="pca")
    if mode_mask & 0x04:                                     # mode 2
        cand[2] = _top_parts(pts[..., :3], 3, plist, 4, topk)
    if mode_mask & 0x01:                                     # mode 0
        # mode 0 has only 16 partitions: above the HIGHQUALITY threshold
        # full-fit them all, exactly as the reference quantizes every
        # partition before shaking the sorted best (bc7_body:582-709) —
        # the estimator shortlist is a budget device, not part of the
        # search contract
        if quality > 0.75:
            cand[0] = jnp.broadcast_to(
                jnp.arange(len(plist16), dtype=I32)[None],
                (n, len(plist16)))
        else:
            cand[0] = _top_parts(pts[..., :3], 3, plist16, 8, topk)

    errs = []
    words_list = []
    modes_used = []
    for m in BC7_MODES:
        if not (mode_mask >> m.mode) & 1:
            continue
        if m.mode in (4, 5):
            # keep=2 at max quality: the reference shakes EVERY (rot, sel)
            # candidate above HIGH_THRESHOLD (bc7_body:1153-1239)
            err, wd = encode_dual_mode(pts, m, w, shake_rounds=shake,
                                       uber=uber, iters=iters,
                                       keep=2 if q_eff > 0.75 else 1)
        elif m.alpha_bits:  # modes 6, 7 (COMBINED_ALPHA)
            err, wd = encode_single_mode(
                pts, m, jnp.asarray(w, F32),
                plist16 if m.mode == 0 else plist, topk, iters,
                shake_rounds=shake, uber=uber,
                cand_parts=cand.get(m.mode))
            if mode_mask & ~0xC0:  # another mode exists to fall back on
                err = jnp.where(combined_bar, jnp.inf, err)
        else:               # modes 0-3: opaque; charge true alpha error
            err, wd = encode_single_mode(
                pts[..., :3], m, jnp.asarray(w[:3], F32),
                plist16 if m.mode == 0 else plist, topk, iters,
                shake_rounds=shake, uber=uber,
                cand_parts=cand.get(m.mode))
            err = err + alpha_pen
        errs.append(err)
        words_list.append(wd)
        modes_used.append(m.mode)

    errs = jnp.stack(errs, axis=1)                 # (N, M)
    allw = jnp.stack(words_list, axis=1)           # (N, M, 4)
    pick = jnp.argmin(errs, axis=1)
    words = jnp.take_along_axis(allw, pick[:, None, None], axis=1)[:, 0]
    err = jnp.min(errs, axis=1)
    return words, err

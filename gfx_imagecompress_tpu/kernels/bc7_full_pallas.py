"""Fused full-BC7 (all 8 modes) encoder as a Pallas TPU kernel.

Generalizes bc7_fast_pallas.py to the complete AMD-path mode sweep
(kernels/bc7_full.py semantics): single-index modes 0/1/2/3/6/7 via one
parameterized evaluator (per-mode precision, subsets, p-bit scheme, index
width), dual-index modes 4/5 with the rotation race and the mode-4
index-selection race (amd_bc7_body.cpp:1099-1127), opaque modes charged
the true alpha penalty, masked argmin across modes, and per-mode packing
lane-selected by the winner. Anchor-dependent index layouts are emitted per
anchor class (4 classes for 2-subset shapes, 18 (a1, a2) pairs for
3-subset) — all static.

Quality machinery mirrored from kernels/bc7_full.py (parity-tested):
  - the quantized-space endpoint shaker (ep_shaker_2_d's shake cube,
    amd_shake.cpp:898-1044) as per-channel +-range sweeps with fixed
    indices, then a p-bit re-race + index requantize;
  - the uber selector machinery (richgel999_bc7enc16.cpp:896-1006):
    selector perturbation/extrapolation variants LSQ-refit and re-raced,
    applied to the winning partition's subsets.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables.bc7_tables import (ANCHOR2, ANCHOR3_1, ANCHOR3_2, BC7_MODES,
                                 P2, P3, WEIGHTS2, WEIGHTS3, WEIGHTS4)
from .bc7_fast_pallas import (_assign_exact, _assign_float, _lerp64,
                              _lsq_multi, _put, _quant_pbit, _sel_by_id,
                              _sel_variant_rows)

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

SUB = 8          # sublane dim of the per-block tile
LANE = 128       # lane dim
TILE = SUB * LANE    # blocks per grid step ((8,128) native f32 vreg tile)
LV = {2: tuple(w / 64.0 for w in WEIGHTS2),
      3: tuple(w / 64.0 for w in WEIGHTS3),
      4: tuple(w / 64.0 for w in WEIGHTS4)}
WT = {2: WEIGHTS2, 3: WEIGHTS3, 4: WEIGHTS4}
_EPS = 1e-8

PAIRS3 = tuple(sorted(set(zip(ANCHOR3_1, ANCHOR3_2))))


def _subset_rows(pid_bits: int, subsets: int):
    """Static subset id per pixel for a packed partition constant."""
    if subsets == 2:
        return [(pid_bits >> p) & 1 for p in range(16)]
    return [(pid_bits >> (2 * p)) & 3 for p in range(16)]


def _estimate(xs, plist, subsets: int, levels: int):
    """Bounds-axis estimate per partition (masks static per pixel row)."""
    table = P2 if subsets == 2 else P3
    ests = []
    for pid in plist:
        subs = _subset_rows(table[pid], subsets)
        est = None
        for s in range(subsets):
            rows = [p for p in range(16) if subs[p] == s]
            if not rows:
                continue
            cnt = float(len(rows))
            nc = len(xs)
            mean = [sum(x[p:p + 1] for p in rows) / cnt for x in xs]
            cen = [[x[p:p + 1] - mean[c] for p in rows]
                   for c, x in enumerate(xs)]
            lo, hi = [], []
            for c in range(nc):
                l = h = cen[c][0]
                for r in cen[c][1:]:
                    l = jnp.minimum(l, r)
                    h = jnp.maximum(h, r)
                lo.append(l)
                hi.append(h)
            axis = [h - l for h, l in zip(hi, lo)]
            n = jnp.sqrt(sum(a * a for a in axis))
            inv = 1.0 / jnp.maximum(n, 1e-6)
            axis = [a * inv for a in axis]
            ts = [sum(cen[c][i] * axis[c] for c in range(nc))
                  for i in range(len(rows))]
            tmin = tmax = ts[0]
            for t in ts[1:]:
                tmin = jnp.minimum(tmin, t)
                tmax = jnp.maximum(tmax, t)
            span = jnp.maximum(tmax - tmin, 1e-6)
            for i, t in enumerate(ts):
                tq = jnp.round((t - tmin) / span * (levels - 1))
                tr = tq * (1.0 / (levels - 1)) * span + tmin
                d2 = sum(cen[c][i] * cen[c][i] for c in range(nc)) - t * t
                add = d2 + (t - tr) ** 2
                est = add if est is None else est + add
        ests.append(est)
    return ests


def _estimate_pca(xs, plist, subsets: int, levels: int, iters: int = 4):
    """PCA-axis estimate per partition (masks static per pixel row).

    Same contract as :func:`_estimate` but projects onto a power-iterated
    principal eigenvector of the per-subset covariance instead of the
    residual bounding box. Used for mode 7: on 4-channel alpha-gradient
    content the bounds axis misranks partitions badly enough that the
    reference's winner often missed even a top-24 shortlist, while PCA
    ranking holds it in the top-8 ~99% of the time (measured,
    scripts/diag_mode7_rank.py; the reference ranks all 64 partitions by
    actual quantizer error, bc7_body:582-643)."""
    table = P2 if subsets == 2 else P3
    nc = len(xs)
    ests = []
    for pid in plist:
        subs = _subset_rows(table[pid], subsets)
        est = None
        for s in range(subsets):
            rows = [p for p in range(16) if subs[p] == s]
            if not rows:
                continue
            cnt = float(len(rows))
            mean = [sum(x[p:p + 1] for p in rows) / cnt for x in xs]
            cen = [[x[p:p + 1] - mean[c] for p in rows]
                   for c, x in enumerate(xs)]
            cov = {}
            for a in range(nc):
                for b in range(a, nc):
                    cov[(a, b)] = sum(cen[a][i] * cen[b][i]
                                      for i in range(len(rows)))

            def cv(a, b):
                return cov[(a, b)] if a <= b else cov[(b, a)]

            v = [jnp.ones_like(mean[0]) for _ in range(nc)]
            for _ in range(iters):
                nv = [sum(cv(a, b) * v[b] for b in range(nc))
                      for a in range(nc)]
                n = jnp.sqrt(sum(x * x for x in nv))
                ok = n > 1e-8
                inv = 1.0 / jnp.maximum(n, 1e-8)
                v = [jnp.where(ok, a * inv, b) for a, b in zip(nv, v)]
            axis = v
            ts = [sum(cen[c][i] * axis[c] for c in range(nc))
                  for i in range(len(rows))]
            tmin = tmax = ts[0]
            for t in ts[1:]:
                tmin = jnp.minimum(tmin, t)
                tmax = jnp.maximum(tmax, t)
            span = jnp.maximum(tmax - tmin, 1e-6)
            for i, t in enumerate(ts):
                tq = jnp.round((t - tmin) / span * (levels - 1))
                tr = tq * (1.0 / (levels - 1)) * span + tmin
                d2 = sum(cen[c][i] * cen[c][i] for c in range(nc)) - t * t
                add = d2 + (t - tr) ** 2
                est = add if est is None else est + add
        ests.append(est)
    return ests


def _topk(ests, plist, k):
    ids = []
    big = jnp.float32(3.4e38)
    ests = list(ests)
    for _ in range(k):
        best = ests[0]
        bid = jnp.zeros_like(ests[0], I32) + plist[0]
        slot = jnp.zeros_like(ests[0], I32)
        for j in range(1, len(plist)):
            take = ests[j] < best
            best = jnp.where(take, ests[j], best)
            bid = jnp.where(take, plist[j], bid)
            slot = jnp.where(take, j, slot)
        ids.append(bid)
        ests = [jnp.where(slot == j, big, ests[j])
                for j in range(len(plist))]
    return ids


def _fit_masked(xs, mrows, levels, iters):
    """Masked n-channel PCA + LSQ fit."""
    nc = len(xs)
    m = jnp.concatenate(mrows, axis=0)
    cnt = jnp.maximum(jnp.sum(m, axis=0, keepdims=True), 1.0)
    mean = [jnp.sum(x * m, axis=0, keepdims=True) / cnt for x in xs]
    cen = [(x - mn) * m for x, mn in zip(xs, mean)]
    cov = {}
    for a in range(nc):
        for b in range(a, nc):
            cov[(a, b)] = jnp.sum(cen[a] * cen[b], axis=0, keepdims=True)

    def cv(a, b):
        return cov[(a, b)] if a <= b else cov[(b, a)]

    v = [jnp.ones_like(mean[0]) for _ in range(nc)]
    for _ in range(8):
        nv = [sum(cv(a, b) * v[b] for b in range(nc)) for a in range(nc)]
        n = jnp.sqrt(sum(x * x for x in nv))
        ok = n > _EPS
        inv = 1.0 / jnp.maximum(n, _EPS)
        v = [jnp.where(ok, a * inv, b) for a, b in zip(nv, v)]
    n = jnp.sqrt(sum(x * x for x in v))
    ok = n > _EPS
    inv = 1.0 / jnp.maximum(n, _EPS)
    fb = 1.0 / (nc ** 0.5)
    axis = [jnp.where(ok, a * inv, fb) for a in v]
    t = sum(c * a for c, a in zip(cen, axis))
    big = jnp.float32(1e30)
    tmin = jnp.min(jnp.where(m > 0, t, big), axis=0, keepdims=True)
    tmax = jnp.max(jnp.where(m > 0, t, -big), axis=0, keepdims=True)
    tmin = jnp.where(tmin > tmax, 0.0, tmin)
    tmax = jnp.where(tmax < tmin, 0.0, tmax)
    e0 = [mn + tmin * a for mn, a in zip(mean, axis)]
    e1 = [mn + tmax * a for mn, a in zip(mean, axis)]
    for _ in range(iters):
        alpha = _assign_float(xs, e0, e1, levels)
        e0, e1 = _lsq_multi(xs, alpha, m, e0, e1)
    return e0, e1


def _quant_plain(e, bits):
    scale = (1 << bits) - 1
    q = jnp.clip(jnp.round(e * (scale / 255.0)), 0, scale).astype(I32)
    deq = (q << (8 - bits)) | (q >> (2 * bits - 8))
    return q, deq


def _pbit_combos(mode):
    if mode.pbit_mode == "per_endpoint":
        return ((0, 0), (0, 1), (1, 0), (1, 1))
    if mode.pbit_mode == "shared":
        return ((0, 0), (1, 1))
    return ((None, None),)


def _sel_tuple(take, a, b):
    """where(take, a, b) over tuples whose elements may be lists of rows."""
    out = []
    for an, bn in zip(a, b):
        if isinstance(an, list):
            out.append([jnp.where(take, x, y) for x, y in zip(an, bn)])
        else:
            out.append(jnp.where(take, an, bn))
    return tuple(out)


def _merge_tuple(cand, best):
    """Keyed-on-element-0 argmin merge; elements may be lists of rows."""
    if best is None:
        return cand
    return _sel_tuple(cand[0] < best[0], cand, best)


def _deq_ch(q, p, bits: int, has_p: bool):
    """Endpoint field (+ optional pbit) -> decoded 8-bit int rows."""
    if has_p:
        full = (q << 1) | p
        tb = bits + 1
    else:
        full = q
        tb = bits
    return (full << (8 - tb)) | (full >> (2 * tb - 8))


def _wk_rows(idx, wtab):
    """Index rows -> 64-weight rows via static select chain."""
    wk = jnp.zeros_like(idx)
    for k, wv in enumerate(wtab):
        if wv:
            wk = jnp.where(idx == k, wv, wk)
    return wk


def _quant_ch_rows(e0, e1, mode, p0, p1):
    """Quantize all channel rows under one (p0,p1) -> (q0s,q1s,d0s,d1s)."""
    q0s, d0s, q1s, d1s = [], [], [], []
    for c in range(len(e0)):
        bits = mode.colour_bits if c < 3 else mode.alpha_bits
        if p0 is None:
            q0, d0 = _quant_plain(e0[c], bits)
            q1, d1 = _quant_plain(e1[c], bits)
        else:
            q0, d0 = _quant_pbit(e0[c], bits, p0)
            q1, d1 = _quant_pbit(e1[c], bits, p1)
        q0s.append(q0)
        d0s.append(d0)
        q1s.append(q1)
        d1s.append(d1)
    return q0s, q1s, d0s, d1s


def _quant_subset_rows(xs, m, mode, e0, e1, analytic: bool = False,
                       pbit_race: int = 1):
    """Quantize one subset's float endpoints against the exact palette
    (kernels/bc7_full.py _quant_subset analog).

    ``analytic``: p-bits chosen by endpoint rounding error with ONE palette
    evaluation (race path; the winner's shake re-races p-bits exactly).
    ``pbit_race=2`` races the top-2 combos by rounding error exactly
    (kernels/bc7_full.py mirror — the mode-0 machinery).
    Returns (err (1,T), q0s, q1s lists, pb0, pb1 (1,T), idx (16,T))."""
    wtab = WT[mode.index_bits]
    if analytic and mode.pbit_mode != "none":
        e0c = [jnp.clip(e, 0.0, 255.0) for e in e0]
        e1c = [jnp.clip(e, 0.0, 255.0) for e in e1]
        combos = (((0, 0), (0, 1), (1, 0), (1, 1))
                  if mode.pbit_mode == "per_endpoint" else ((0, 0), (1, 1)))
        pick = None
        pick2 = None
        for p0, p1 in combos:
            q0s, q1s, d0s, d1s = _quant_ch_rows(e0c, e1c, mode, p0, p1)
            perr = None
            for c in range(len(e0)):
                e = ((d0s[c].astype(F32) - e0c[c]) ** 2
                     + (d1s[c].astype(F32) - e1c[c]) ** 2)
                perr = e if perr is None else perr + e
            z = jnp.zeros_like(perr, I32)
            cand = (perr, q0s, q1s, d0s, d1s, z + p0, z + p1)
            if pick is None:
                pick = cand
            else:
                take = cand[0] < pick[0]
                loser = _sel_tuple(take, pick, cand)
                pick = _sel_tuple(take, cand, pick)
                if pbit_race > 1:
                    pick2 = (loser if pick2 is None
                             else _merge_tuple(loser, pick2))
        best = None
        for pk in ([pick, pick2] if pbit_race > 1 and pick2 is not None
                   else [pick]):
            _, q0s, q1s, d0s, d1s, pb0, pb1 = pk
            idx, err = _assign_exact(xs, d0s, d1s, wtab, False, mask=m)
            best = _merge_tuple((err, q0s, q1s, pb0, pb1, idx), best)
        return best
    sbest = None
    for p0, p1 in _pbit_combos(mode):
        q0s, q1s, d0s, d1s = _quant_ch_rows(e0, e1, mode, p0, p1)
        idx, err = _assign_exact(xs, d0s, d1s, wtab, False, mask=m)
        z = jnp.zeros_like(err, I32)
        cand = (err, q0s, q1s, z + (p0 or 0), z + (p1 or 0), idx)
        sbest = _merge_tuple(cand, sbest)
    return sbest


def _shake_rows(xs, m, mode, q0s, q1s, pb0, pb1, idx, err, rounds: int,
                srange: int = 1):
    """Quantized-space endpoint shaker on lane rows — ep_shaker_2_d's
    shake-cube analog (amd_shake.cpp:898-1044; kernels/bc7_full.py
    _shake_subset semantics, parity-tested against it).

    xs: channel rows (16,T); m (16,T) subset mask; q0s/q1s per-channel
    (1,T) codes; pb0/pb1 (1,T); idx (16,T). Returns the same tuple shape.
    """
    chans = len(xs)
    has_p = mode.pbit_mode != "none"
    wtab = WT[mode.index_bits]
    deltas = tuple((a, b) for a in range(-srange, srange + 1)
                   for b in range(-srange, srange + 1) if (a, b) != (0, 0))
    for _ in range(rounds):
        wk = _wk_rows(idx, wtab)                            # (16,T)
        for c in range(chans):
            bits = mode.colour_bits if c < 3 else mode.alpha_bits
            maxq = (1 << bits) - 1
            q0c, q1c = q0s[c], q1s[c]
            d0 = _deq_ch(q0c, pb0, bits, has_p)
            d1 = _deq_ch(q1c, pb1, bits, has_p)
            diff = _lerp64(d0, d1, wk).astype(F32) - xs[c]
            best_e = jnp.sum(m * diff * diff, axis=0, keepdims=True)
            b0, b1 = q0c, q1c
            for da, db in deltas:
                nq0 = jnp.clip(q0c + da, 0, maxq)
                nq1 = jnp.clip(q1c + db, 0, maxq)
                d0 = _deq_ch(nq0, pb0, bits, has_p)
                d1 = _deq_ch(nq1, pb1, bits, has_p)
                diff = _lerp64(d0, d1, wk).astype(F32) - xs[c]
                e = jnp.sum(m * diff * diff, axis=0, keepdims=True)
                take = e < best_e
                best_e = jnp.where(take, e, best_e)
                b0 = jnp.where(take, nq0, b0)
                b1 = jnp.where(take, nq1, b1)
            q0s = q0s[:c] + [b0] + q0s[c + 1:]
            q1s = q1s[:c] + [b1] + q1s[c + 1:]
        # p-bit re-race + index requantize against the exact palette
        best = None
        for c0, c1 in _pbit_combos(mode):
            np0 = pb0 if c0 is None else jnp.zeros_like(pb0) + c0
            np1 = pb1 if c1 is None else jnp.zeros_like(pb1) + c1
            d0s = [_deq_ch(q0s[c], np0,
                           mode.colour_bits if c < 3 else mode.alpha_bits,
                           has_p) for c in range(chans)]
            d1s = [_deq_ch(q1s[c], np1,
                           mode.colour_bits if c < 3 else mode.alpha_bits,
                           has_p) for c in range(chans)]
            nidx, ne = _assign_exact(xs, d0s, d1s, wtab, False, mask=m)
            best = _merge_tuple((ne, np0, np1, nidx), best)
        err, pb0, pb1, nidx = best
        idx = jnp.where(m > 0, nidx, idx)
    return err, q0s, q1s, pb0, pb1, idx


def _uber_rows(xs, m, mode, q0s, q1s, pb0, pb1, idx, err, uber: int,
               pbit_race: int = 1):
    """Uber selector rounds on one subset (kernels/bc7_full.py _uber_subset
    analog; richgel999_bc7enc16.cpp:896-1006 machinery)."""
    chans = len(xs)
    has_p = mode.pbit_mode != "none"
    lv = LV[mode.index_bits]
    max_sel = (1 << mode.index_bits) - 1
    d0 = [_deq_ch(q0s[c], pb0,
                  mode.colour_bits if c < 3 else mode.alpha_bits,
                  has_p).astype(F32) for c in range(chans)]
    d1 = [_deq_ch(q1s[c], pb1,
                  mode.colour_bits if c < 3 else mode.alpha_bits,
                  has_p).astype(F32) for c in range(chans)]
    mi = m > 0
    big = jnp.int32(1 << 20)
    mn = jnp.min(jnp.where(mi, idx, big), axis=0, keepdims=True)
    mx = jnp.max(jnp.where(mi, idx, -big), axis=0, keepdims=True)
    base_rows = [idx[p:p + 1] for p in range(16)]
    best = (err, q0s, q1s, pb0, pb1, idx)
    for v in _sel_variant_rows(base_rows, mn, mx, max_sel, uber):
        vcat = jnp.concatenate(v, axis=0)
        lvl = jnp.zeros_like(xs[0])
        for k, l in enumerate(lv):
            if l:
                lvl = jnp.where(vcat == k, l, lvl)
        e0v, e1v = _lsq_multi(xs, lvl, m, d0, d1)
        errv, q0v, q1v, p0v, p1v, idxv = _quant_subset_rows(
            xs, m, mode, e0v, e1v, analytic=True, pbit_race=pbit_race)
        cand = (errv, q0v, q1v, p0v, p1v, jnp.where(mi, idxv, idx))
        best = _merge_tuple(cand, best)
    return best


def _single_mode(xs, mode, plist, topk, iters, shake, uber,
                 part_ids=None):
    """Generic single-index mode evaluator.

    xs: channel rows ((16,T) each), 3 or 4 depending on mode.alpha_bits.
    part_ids: optional precomputed top-k partition-id rows ((1,T) each) —
    the shared XLA-side estimate (one estimate reused across modes, the
    reference's sortProjection-once structure, bc7_body:643-709); when
    absent the estimate runs in-kernel. Returns candidate dict.
    """
    s_count = mode.subsets
    levels = LV[mode.index_bits]
    if s_count == 1:
        part_ids = [jnp.zeros_like(xs[0][0:1], I32)]
    elif part_ids is None:
        lvn = 1 << mode.index_bits
        ests = _estimate(xs, plist, s_count, lvn)
        part_ids = _topk(ests, plist, min(topk, len(plist)))
    table = P2 if s_count == 2 else P3
    # top-2 race for low-bit modes (kernels/bc7_full.py keep2 mirror):
    # refine the runner-up too and pick the post-refinement argmin
    keep2 = (mode.colour_bits <= 5 and s_count >= 2 and len(part_ids) > 1
             and (uber or shake))
    # mode 0: top-2 p-bit race in race + uber requant, two extra scale
    # levels (kernels/bc7_full.py low4/pbit_race mirror; closed ~93% of
    # the mode-0 deficit, scripts/diag_m0_exp.py r4)
    low4 = mode.colour_bits <= 4 and mode.pbit_mode != "none"
    pbit_race = 2 if low4 else 1
    if low4 and uber:
        uber = uber + 2
    best = None
    best2 = None
    for pid in part_ids:
        if s_count == 1:
            sub_of = [jnp.zeros_like(pid) for _ in range(16)]
        else:
            bits_sel = _sel_by_id(pid, [table[p] if p in plist else 0
                                        for p in range(64)])
            if s_count == 2:
                sub_of = [((bits_sel >> p) & 1) for p in range(16)]
            else:
                sub_of = [((bits_sel >> (2 * p)) & 3) for p in range(16)]
        errl = []
        idx_all = None
        q0l, q1l, pb0l, pb1l = [], [], [], []
        for s in range(s_count):
            mrows = [(r == s).astype(F32) for r in sub_of]
            e0, e1 = _fit_masked(xs, mrows, levels, iters)
            m = jnp.concatenate(mrows, axis=0)
            err, q0s, q1s, pb0, pb1, idx = _quant_subset_rows(
                xs, m, mode, e0, e1, analytic=True, pbit_race=pbit_race)
            errl.append(err)
            q0l.append(q0s)
            q1l.append(q1s)
            pb0l.append(pb0)
            pb1l.append(pb1)
            smask = jnp.concatenate([(r == s).astype(I32) for r in sub_of],
                                    axis=0)
            contrib = idx * smask
            idx_all = contrib if idx_all is None else idx_all + contrib
        cand = dict(err=sum(errl), errs=errl, part=pid, q0=q0l, q1=q1l,
                    pb0=pb0l, pb1=pb1l, idx=idx_all)
        if best is None:
            best = cand
        else:
            take = cand["err"] < best["err"]
            if keep2:
                demoted = _merge_dict(cand, best, take)   # loser
                best = _merge_dict(best, cand, take)
                if best2 is None:
                    best2 = demoted
                else:
                    b2 = demoted["err"] < best2["err"]
                    best2 = _merge_dict(best2, demoted, b2)
            else:
                best = _merge_dict(best, cand, take)

    def _refine(st):
        st = dict(st, errs=list(st["errs"]), q0=list(st["q0"]),
                  q1=list(st["q1"]), pb0=list(st["pb0"]),
                  pb1=list(st["pb1"]))
        part = st["part"]
        if s_count == 1:
            sub_of = [jnp.zeros_like(part) for _ in range(16)]
        else:
            bits_sel = _sel_by_id(part, [table[p] if p in plist else 0
                                         for p in range(64)])
            if s_count == 2:
                sub_of = [((bits_sel >> p) & 1) for p in range(16)]
            else:
                sub_of = [((bits_sel >> (2 * p)) & 3) for p in range(16)]
        idx = st["idx"]
        for s in range(s_count):
            mrows = [(r == s).astype(F32) for r in sub_of]
            m = jnp.concatenate(mrows, axis=0)
            err_s, q0s, q1s, pb0, pb1 = (st["errs"][s], st["q0"][s],
                                         st["q1"][s], st["pb0"][s],
                                         st["pb1"][s])
            if uber:
                err_s, q0s, q1s, pb0, pb1, idx = _uber_rows(
                    xs, m, mode, q0s, q1s, pb0, pb1, idx, err_s, uber,
                    pbit_race=pbit_race)
            if shake:
                err_s, q0s, q1s, pb0, pb1, idx = _shake_rows(
                    xs, m, mode, q0s, q1s, pb0, pb1, idx, err_s, shake,
                    srange=2 if shake >= 3 else 1)
            st["errs"][s] = err_s
            st["q0"][s] = q0s
            st["q1"][s] = q1s
            st["pb0"][s] = pb0
            st["pb1"][s] = pb1
        st["idx"] = idx
        st["err"] = sum(st["errs"])
        return st

    if uber or shake:
        # refine + shake the winning partition's subsets (and the runner-
        # up for low-bit modes); the reference spends its shaker budget on
        # every sorted-best partition the same way, bc7_body:643-709
        best = _refine(best)
        if keep2:
            ref2 = _refine(best2)
            take = ref2["err"] < best["err"]
            best = _merge_dict(best, ref2, take)
    return best


def _merge_dict(best, cand, take):
    out = {}
    for k in best:
        b, c = best[k], cand[k]
        if isinstance(b, list):
            out[k] = [
                ([jnp.where(take, cc, bb) for cc, bb in zip(ci, bi)]
                 if isinstance(bi, list) else jnp.where(take, ci, bi))
                for ci, bi in zip(c, b)]
        else:
            out[k] = jnp.where(take, c, b)
    return out


def _fixup_single(mode, st):
    """Anchor fixups for a single-index candidate (pre-pack)."""
    s_count = mode.subsets
    ibits = mode.index_bits
    comp = (1 << ibits) - 1
    msb = 1 << (ibits - 1)
    part = st["part"]
    idx = st["idx"]
    q0, q1 = st["q0"], st["q1"]
    pb0, pb1 = st["pb0"], st["pb1"]
    if s_count == 1:
        anchors = [None]
    elif s_count == 2:
        anchors = [None, _sel_by_id(part, list(ANCHOR2))]
    else:
        anchors = [None, _sel_by_id(part, list(ANCHOR3_1)),
                   _sel_by_id(part, list(ANCHOR3_2))]
    # subset membership per pixel
    if s_count == 1:
        sub_of = [jnp.zeros_like(part) for _ in range(16)]
    else:
        table = P2 if s_count == 2 else P3
        bits_sel = _sel_by_id(part, list(table))
        if s_count == 2:
            sub_of = [((bits_sel >> p) & 1) for p in range(16)]
        else:
            sub_of = [((bits_sel >> (2 * p)) & 3) for p in range(16)]
    for s in range(s_count):
        if anchors[s] is None:
            a_idx = idx[0:1]
        else:
            a_idx = jnp.zeros_like(idx[0:1])
            for p in range(16):
                a_idx = jnp.where(anchors[s] == p, idx[p:p + 1], a_idx)
        need = (a_idx & msb) != 0
        in_s = jnp.concatenate([(r == s).astype(I32) for r in sub_of],
                               axis=0)
        idx = jnp.where(need & (in_s > 0), comp - idx, idx)
        q0[s], q1[s] = ([jnp.where(need, b, a)
                         for a, b in zip(q0[s], q1[s])],
                        [jnp.where(need, a, b)
                         for a, b in zip(q0[s], q1[s])])
        pb0[s], pb1[s] = (jnp.where(need, pb1[s], pb0[s]),
                          jnp.where(need, pb0[s], pb1[s]))
    return dict(st, idx=idx, q0=q0, q1=q1, pb0=pb0, pb1=pb1), anchors


def _pack_single(mode, st):
    st, anchors = _fixup_single(mode, st)
    part = st["part"]
    n_z = jnp.zeros_like(part, U32)
    cols = [n_z, n_z, n_z, n_z]
    cols = _put(cols, jnp.zeros_like(part) + (1 << mode.mode), 0,
                mode.mode + 1)
    pos = mode.mode + 1
    if mode.partition_bits:
        cols = _put(cols, part, pos, mode.partition_bits)
        pos += mode.partition_bits
    nchan = 4 if mode.alpha_bits else 3
    for c in range(nchan):
        bits = mode.colour_bits if c < 3 else mode.alpha_bits
        for s in range(mode.subsets):
            cols = _put(cols, st["q0"][s][c], pos, bits)
            pos += bits
            cols = _put(cols, st["q1"][s][c], pos, bits)
            pos += bits
    if mode.pbit_mode == "per_endpoint":
        for s in range(mode.subsets):
            cols = _put(cols, st["pb0"][s], pos, 1)
            pos += 1
            cols = _put(cols, st["pb1"][s], pos, 1)
            pos += 1
    elif mode.pbit_mode == "shared":
        for s in range(mode.subsets):
            cols = _put(cols, st["pb0"][s], pos, 1)
            pos += 1
    idx = st["idx"]
    ib = mode.index_bits
    if mode.subsets == 1:
        for p in range(16):
            nb = ib - (1 if p == 0 else 0)
            cols = _put(cols, idx[p:p + 1], pos, nb)
            pos += nb
        return cols
    if mode.subsets == 2:
        classes = [(a,) for a in (15, 2, 8, 6)]
        a1 = anchors[1]
        match_of = lambda cl: a1 == cl[0]  # noqa: E731
    else:
        classes = list(PAIRS3)
        a1, a2 = anchors[1], anchors[2]
        match_of = lambda cl: (a1 == cl[0]) & (a2 == cl[1])  # noqa: E731
    acc = [n_z, n_z, n_z, n_z]
    for cl in classes:
        cls = [n_z, n_z, n_z, n_z]
        cpos = pos
        anchor_set = (0,) + cl
        for p in range(16):
            nb = ib - (1 if p in anchor_set else 0)
            cls = _put(cls, idx[p:p + 1], cpos, nb)
            cpos += nb
        mt = match_of(cl)
        acc = [jnp.where(mt, x | y, x) for x, y in zip(acc, cls)]
    return [x | y for x, y in zip(cols, acc)]


# ----------------------------------------------------------- dual modes ---
class _SubMode:
    """Lightweight mode view for shake/uber on dual-mode channel groups."""

    def __init__(self, colour_bits, alpha_bits, index_bits, pbit_mode):
        self.colour_bits = colour_bits
        self.alpha_bits = alpha_bits
        self.index_bits = index_bits
        self.pbit_mode = pbit_mode


# channel permutation per rotation (swap channel rot-1 with alpha)
_ROT_PERMS = ((0, 1, 2, 3), (3, 1, 2, 0), (0, 3, 2, 1), (0, 1, 3, 2))


def _uber_scalar_rows(vals, bits, index_bits, qa0, qa1, aidx, aerr,
                      uber: int):
    """Uber selector rounds for the dual-mode scalar channel on lane rows
    (kernels/bc7_full.py _uber_scalar mirror)."""
    lv = LV[index_bits]
    max_sel = (1 << index_bits) - 1
    wtab = WT[index_bits]
    mn = jnp.min(aidx, axis=0, keepdims=True)
    mx = jnp.max(aidx, axis=0, keepdims=True)
    base_rows = [aidx[p:p + 1] for p in range(16)]
    best = (aerr, qa0, qa1, aidx)
    for v in _sel_variant_rows(base_rows, mn, mx, max_sel, uber):
        vcat = jnp.concatenate(v, axis=0)
        a = jnp.zeros_like(vals)
        for k, l in enumerate(lv):
            if l:
                a = jnp.where(vcat == k, l, a)
        one_a = 1.0 - a
        q00 = jnp.sum(one_a * one_a, axis=0, keepdims=True)
        q01 = jnp.sum(one_a * a, axis=0, keepdims=True)
        q11 = jnp.sum(a * a, axis=0, keepdims=True)
        det = q00 * q11 - q01 * q01
        ok = jnp.abs(det) > 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        b0 = jnp.sum(one_a * vals, axis=0, keepdims=True)
        b1 = jnp.sum(a * vals, axis=0, keepdims=True)
        e0 = (q11 * b0 - q01 * b1) * inv
        e1 = (q00 * b1 - q01 * b0) * inv
        q0, d0 = _quant_plain(jnp.where(ok, e0, 0.0), bits)
        q1, d1 = _quant_plain(jnp.where(ok, e1, 255.0), bits)
        bestd = None
        idx = None
        for k, wk in enumerate(wtab):
            dec = _lerp64(d0, d1, wk).astype(F32)
            d = (vals - dec) ** 2
            if bestd is None:
                bestd, idx = d, jnp.zeros_like(d, I32)
            else:
                take = d < bestd
                bestd = jnp.where(take, d, bestd)
                idx = jnp.where(take, k, idx)
        err = jnp.sum(bestd, axis=0, keepdims=True)
        best = _merge_tuple((err, q0, q1, idx), best)
    return best


def _dual_mode(xs, mode, iters, shake, uber, keep: int = 1):
    """Modes 4/5: rotation race x index-selection race x separate RGB +
    scalar alpha fits (CompressDualIndexBlock analog,
    amd_bc7_body.cpp:1059-1278, incl. the mode-4 indexSelection axis
    :1099-1127); uber + shake refine the top-``keep`` (rot, sel)
    candidates (keep=2 at max quality — the reference shakes EVERY
    candidate above HIGH_THRESHOLD; kernels/bc7_full.py parity)."""
    best = None
    best2 = None
    keep2 = keep > 1 and (uber or shake)
    ones = [jnp.ones_like(xs[0][0:1]) for _ in range(16)]
    m_all = jnp.concatenate(ones, axis=0)
    zero = jnp.zeros_like(xs[0][0:1], I32)
    for rot in range(4):
        p_xs = [xs[i] for i in _ROT_PERMS[rot]]
        rgb, alpha = p_xs[:3], p_xs[3]
        for sel in range(1 << mode.index_mode_bits):
            cbits_idx = mode.index_bits2 if sel else mode.index_bits
            abits_idx = mode.index_bits if sel else mode.index_bits2
            e0, e1 = _fit_masked(rgb, ones, LV[cbits_idx], iters)
            cmode = _SubMode(mode.colour_bits, 0, cbits_idx, "none")
            cerr, qc0, qc1, _, _, cidx = _quant_subset_rows(
                rgb, m_all, cmode, e0, e1)
            aerr, qa0, qa1, aidx = _fit_scalar(alpha, mode.alpha_bits,
                                               abits_idx, iters)
            cand = dict(err=cerr + aerr, cerr=cerr, aerr=aerr,
                        rot=zero + rot, sel=zero + sel,
                        qc0=qc0, qc1=qc1, qa0=qa0, qa1=qa1,
                        cidx=cidx, aidx=aidx)
            if best is None:
                best = cand
            elif keep2:
                take = cand["err"] < best["err"]
                demoted = _merge_dict(cand, best, take)
                best = _merge_dict(best, cand, take)
                if best2 is None:
                    best2 = demoted
                else:
                    b2 = demoted["err"] < best2["err"]
                    best2 = _merge_dict(best2, demoted, b2)
            else:
                take = cand["err"] < best["err"]
                best = _merge_dict(best, cand, take)

    def _refine(st):
        # permute channel rows by the candidate's rotation (lane select),
        # refine each static sel path, lane-select
        st = dict(st)
        rot = st["rot"]
        rgb = [None] * 3
        alpha = None
        for c in range(4):
            px = None
            for r in range(4):
                src = xs[_ROT_PERMS[r][c]]
                px = src if px is None else jnp.where(rot == r, src, px)
            if c < 3:
                rgb[c] = px
            else:
                alpha = px
        for sv in range(1 << mode.index_mode_bits):
            in_sel = (st["sel"] == sv) if mode.index_mode_bits else None
            cbits_idx = mode.index_bits2 if sv else mode.index_bits
            abits_idx = mode.index_bits if sv else mode.index_bits2
            cmode = _SubMode(mode.colour_bits, 0, cbits_idx, "none")
            cerr_v, qc0v, qc1v, cidx_v = (st["cerr"], st["qc0"],
                                          st["qc1"], st["cidx"])
            aerr_u, qa0_u, qa1_u, aidx_u = (st["aerr"], st["qa0"],
                                            st["qa1"], st["aidx"])
            if uber:
                cerr_v, qc0v, qc1v, _, _, cidx_v = _uber_rows(
                    rgb, m_all, cmode, qc0v, qc1v, zero, zero, cidx_v,
                    cerr_v, min(uber, 2))
                aerr_u, qa0_u, qa1_u, aidx_u = _uber_scalar_rows(
                    alpha, mode.alpha_bits, abits_idx, qa0_u, qa1_u,
                    aidx_u, aerr_u, min(uber, 2))
            if shake:
                cerr_v, qc0v, qc1v, _, _, cidx_v = _shake_rows(
                    rgb, m_all, cmode, qc0v, qc1v, zero, zero, cidx_v,
                    cerr_v, shake)
                amode = _SubMode(mode.alpha_bits, 0, abits_idx, "none")
                aerr_v, qa0l, qa1l, _, _, aidx_v = _shake_rows(
                    [alpha], m_all, amode, [qa0_u], [qa1_u],
                    zero, zero, aidx_u, aerr_u, shake)
                qa0v, qa1v = qa0l[0], qa1l[0]
            else:
                aerr_v, qa0v, qa1v, aidx_v = aerr_u, qa0_u, qa1_u, aidx_u
            gain = (cerr_v + aerr_v) < st["err"]
            tk = gain if in_sel is None else (in_sel & gain)
            st["cerr"] = jnp.where(tk, cerr_v, st["cerr"])
            st["aerr"] = jnp.where(tk, aerr_v, st["aerr"])
            st["qc0"] = [jnp.where(tk, a, b)
                         for a, b in zip(qc0v, st["qc0"])]
            st["qc1"] = [jnp.where(tk, a, b)
                         for a, b in zip(qc1v, st["qc1"])]
            st["qa0"] = jnp.where(tk, qa0v, st["qa0"])
            st["qa1"] = jnp.where(tk, qa1v, st["qa1"])
            st["cidx"] = jnp.where(tk, cidx_v, st["cidx"])
            st["aidx"] = jnp.where(tk, aidx_v, st["aidx"])
            st["err"] = st["cerr"] + st["aerr"]
        return st

    if uber or shake:
        best = _refine(best)
        if keep2 and best2 is not None:
            ref2 = _refine(best2)
            take = ref2["err"] < best["err"]
            best = _merge_dict(best, ref2, take)

    sel1 = best["sel"] == 1
    best["f1idx"] = jnp.where(sel1, best["aidx"], best["cidx"])
    best["f2idx"] = jnp.where(sel1, best["cidx"], best["aidx"])
    return best


def _fit_scalar(vals, bits, index_bits, iters):
    lv = [jnp.float32(l) for l in LV[index_bits]]
    e0 = jnp.min(vals, axis=0, keepdims=True)
    e1 = jnp.max(vals, axis=0, keepdims=True)
    for _ in range(iters):
        bestd = None
        alpha = None
        for l in lv:
            p = e0 + l * (e1 - e0)
            d = (vals - p) ** 2
            if bestd is None:
                bestd, alpha = d, jnp.zeros_like(d) + l
            else:
                take = d < bestd
                bestd = jnp.where(take, d, bestd)
                alpha = jnp.where(take, l, alpha)
        one_a = 1.0 - alpha
        q00 = jnp.sum(one_a * one_a, axis=0, keepdims=True)
        q01 = jnp.sum(one_a * alpha, axis=0, keepdims=True)
        q11 = jnp.sum(alpha * alpha, axis=0, keepdims=True)
        det = q00 * q11 - q01 * q01
        ok = jnp.abs(det) > 1e-6
        inv = 1.0 / jnp.where(ok, det, 1.0)
        b0 = jnp.sum(one_a * vals, axis=0, keepdims=True)
        b1 = jnp.sum(alpha * vals, axis=0, keepdims=True)
        n0 = (q11 * b0 - q01 * b1) * inv
        n1 = (q00 * b1 - q01 * b0) * inv
        e0 = jnp.where(ok, n0, e0)
        e1 = jnp.where(ok, n1, e1)
    q0, d0 = _quant_plain(e0, bits)
    q1, d1 = _quant_plain(e1, bits)
    best = None
    idx = None
    for k, wk in enumerate(WT[index_bits]):
        dec = _lerp64(d0, d1, wk).astype(F32)
        d = (vals - dec) ** 2
        if best is None:
            best, idx = d, jnp.zeros_like(d, I32)
        else:
            take = d < best
            best = jnp.where(take, d, best)
            idx = jnp.where(take, k, idx)
    return jnp.sum(best, axis=0, keepdims=True), q0, q1, idx


def _pack_dual(mode, st):
    """Pack a dual-index candidate; mirrors bc7_common.pack_dual semantics
    (field1 drives colour iff sel == 0; each field's anchor fixup swaps the
    endpoint pair that field drives, EncodeDualIndexBlock
    amd_bc7_body.cpp:937-988)."""
    f1idx, f2idx = st["f1idx"], st["f2idx"]
    qc0, qc1 = st["qc0"], st["qc1"]
    qa0, qa1 = st["qa0"], st["qa1"]
    sel = st["sel"]
    sel1 = sel == 0
    msb1 = 1 << (mode.index_bits - 1)
    comp1 = (1 << mode.index_bits) - 1
    need = (f1idx[0:1] & msb1) != 0
    f1idx = jnp.where(need, comp1 - f1idx, f1idx)
    sw_c1 = need & sel1
    sw_a1 = need & ~sel1
    qc0, qc1 = ([jnp.where(sw_c1, b, a) for a, b in zip(qc0, qc1)],
                [jnp.where(sw_c1, a, b) for a, b in zip(qc0, qc1)])
    qa0, qa1 = (jnp.where(sw_a1, qa1, qa0), jnp.where(sw_a1, qa0, qa1))
    msb2 = 1 << (mode.index_bits2 - 1)
    comp2 = (1 << mode.index_bits2) - 1
    need2 = (f2idx[0:1] & msb2) != 0
    f2idx = jnp.where(need2, comp2 - f2idx, f2idx)
    sw_a2 = need2 & sel1
    sw_c2 = need2 & ~sel1
    qa0, qa1 = (jnp.where(sw_a2, qa1, qa0), jnp.where(sw_a2, qa0, qa1))
    qc0, qc1 = ([jnp.where(sw_c2, b, a) for a, b in zip(qc0, qc1)],
                [jnp.where(sw_c2, a, b) for a, b in zip(qc0, qc1)])
    z = jnp.zeros_like(st["rot"], U32)
    cols = [z, z, z, z]
    cols = _put(cols, jnp.zeros_like(st["rot"]) + (1 << mode.mode), 0,
                mode.mode + 1)
    pos = mode.mode + 1
    cols = _put(cols, st["rot"], pos, 2)
    pos += 2
    if mode.index_mode_bits:
        cols = _put(cols, sel, pos, 1)
        pos += 1
    for c in range(3):
        cols = _put(cols, qc0[c], pos, mode.colour_bits)
        pos += mode.colour_bits
        cols = _put(cols, qc1[c], pos, mode.colour_bits)
        pos += mode.colour_bits
    cols = _put(cols, qa0, pos, mode.alpha_bits)
    pos += mode.alpha_bits
    cols = _put(cols, qa1, pos, mode.alpha_bits)
    pos += mode.alpha_bits
    for p in range(16):
        nb = mode.index_bits - (1 if p == 0 else 0)
        cols = _put(cols, f1idx[p:p + 1], pos, nb)
        pos += nb
    for p in range(16):
        nb = mode.index_bits2 - (1 if p == 0 else 0)
        cols = _put(cols, f2idx[p:p + 1], pos, nb)
        pos += nb
    return cols


# ---------------------------------------------------------------- kernel ---
def _est_kernel(x_ref, out_ref, *, chans, subsets, plist, levels, k,
                estimator="bounds"):
    """Partition estimate + top-k as a Pallas kernel.

    The XLA-side ``_estimate_partitions_vec`` materializes (N,P,16,C)
    intermediates in HBM (~200 MB at P=64 / N=16k) and was the dominant
    cost of the whole encode (measured r4: 2.8-3.6 ms per group vs
    <0.5 ms in-kernel); here the sweep stays in VMEM rows."""
    xs = [x_ref[16 * c:16 * (c + 1), 0].astype(F32) * 255.0
          for c in range(chans)]
    fn = _estimate_pca if estimator == "pca" else _estimate
    ests = fn(xs, plist, subsets, levels)
    ids = _topk(ests, plist, k)
    for i, r in enumerate(ids):
        out_ref[i:i + 1, 0] = r


def _estimate_topk_rows(xt, grid_n, sub, lane, chans, subsets, plist,
                        levels, k, interpret, estimator="bounds"):
    """-> ((K, grid_n, sub, lane) int32 partition-id rows, K)."""
    k = min(k, len(plist))
    kern = partial(_est_kernel, chans=chans, subsets=subsets,
                   plist=tuple(plist), levels=levels, k=k,
                   estimator=estimator)
    out = pl.pallas_call(
        kern,
        grid=(grid_n,),
        in_specs=[pl.BlockSpec((64, 1, sub, lane), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, 1, sub, lane), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, grid_n, sub, lane), I32),
        interpret=interpret,
    )(xt)
    return out, k


def _budgets(quality: float):
    """Mirrors kernels/bc7_full.py _budgets: (partition shortlist, topk,
    fit iters, shake rounds, uber level)."""
    if quality <= 0.25:
        return 16, 1, 1, 0, 0
    if quality <= 0.5:
        return 32, 2, 2, 1, 1
    if quality <= 0.75:
        return 64, 3, 2, 1, 2
    # topk 8 = the reference's numShakeAttempts = 8 * quality at 1.0
    return 64, 8, 3, 3, 4


def _mode_kernel(x_ref, *refs, mode, quality, nparts_k,
                 plist_override=None, topk_override=None,
                 shake_override=None, uber_override=None):
    """One BC7 mode per pallas program — keeps the VMEM live set bounded
    (a single all-modes kernel needs a ~36 MB value stack).

    For multi-subset modes an extra leading ref carries the shared top-k
    partition-id rows computed once in XLA."""
    if nparts_k:
        parts_ref, w0, w1, w2, w3, err_ref = refs
        part_ids = [parts_ref[k:k + 1, 0] for k in range(nparts_k)]
    else:
        w0, w1, w2, w3, err_ref = refs
        part_ids = None
    # 3D lane layout: every per-block row is a full (1,SUB,LANE) vreg (no
    # wasted sublanes) and pixel-axis reductions are elementwise vreg adds
    xs = [x_ref[16 * c:16 * (c + 1), 0].astype(F32) * 255.0
          for c in range(4)]
    nparts, topk, iters, shake, uber = _budgets(quality)
    plist = plist_override or (
        tuple(range(min(nparts, 16))) if mode.mode == 0
        else tuple(range(nparts)))
    topk = topk_override or topk
    if shake_override is not None:
        shake = shake_override
    if uber_override is not None:
        uber = uber_override
    if mode.mode in (4, 5):
        st = _dual_mode(xs, mode, iters, shake, uber,
                        keep=2 if quality > 0.75 else 1)
        err = st["err"]
        cols = _pack_dual(mode, st)
    elif mode.alpha_bits:
        st = _single_mode(xs, mode, plist, topk, iters, shake, uber,
                          part_ids)
        err = st["err"]
        cols = _pack_single(mode, st)
    else:
        st = _single_mode(xs[:3], mode, plist, topk, iters, shake, uber,
                          part_ids)
        da = xs[3] - 255.0
        err = st["err"] + jnp.sum(da * da, axis=0, keepdims=True)
        cols = _pack_single(mode, st)
    w0[:] = cols[0]
    w1[:] = cols[1]
    w2[:] = cols[2]
    w3[:] = cols[3]
    err_ref[:] = err


@partial(jax.jit, static_argnames=("quality", "mode_mask", "tile",
                                  "colour_restrict", "alpha_restrict",
                                  "performance",
                                  "_plist", "_topk", "_shake", "_uber"))
def encode_bc7_blocks_pallas(blocks: jnp.ndarray, *, quality: float = 1.0,
                             mode_mask: int = 0xFF, tile: int = TILE,
                             colour_restrict: bool = True,
                             alpha_restrict: bool = True,
                             performance: float = 1.0,
                             _plist=None, _topk=None, _shake=None,
                             _uber=None):
    """(N,16,4) float RGBA blocks in [0,1] -> ((N,4) uint32, (N,) err)."""
    n = blocks.shape[0]
    if tile > LANE and tile % LANE:
        # a value like 192 would silently coerce to 128 below; small tiles
        # (< LANE, interpret-mode tests) intentionally use non-native lanes
        raise ValueError(
            f"tile above {LANE} must be a multiple of the native lane "
            f"width {LANE}; got {tile}")
    lane = min(tile, LANE)
    sub = max(tile // lane, 1)
    tile = sub * lane
    npad = -n % tile
    x = blocks[..., :4].astype(F32)
    if npad:
        pad = jnp.zeros((npad, 16, 4), F32).at[..., 3].set(1.0)
        x = jnp.concatenate([x, pad], axis=0)
    total = x.shape[0]
    grid_n = total // tile
    xt = x.transpose(2, 1, 0).reshape(64, grid_n, sub, lane)
    interpret = jax.default_backend() == "cpu"

    # ---- shared partition estimation (one Pallas pass per
    # (subsets, channels) group, reused by every mode in the group —
    # VERDICT r1 item 4; mirrors the reference's estimate-once structure)
    from .bc7_full import _combined_alpha_bar
    # performance<1 mapping mirrors kernels/bc7_full.py: the reference's
    # knob ROUTES high-range blocks to its optimal trace quantizer, so
    # lower performance means more quality — lift the budget tier and add
    # a top-k slot (measured on the bc7_full_p0.3 row)
    perf = min(max(performance, 0.0), 1.0)
    quality = max(quality, 1.0 - perf) if perf < 1.0 else quality
    nparts, topk, _, _, _ = _budgets(quality)
    if perf < 1.0:
        topk += 1
    if _topk:
        topk = _topk
    pts255 = x * 255.0
    # COMBINED_ALPHA restrictions (bc7_body:1312-1380) as err masking
    bar = _combined_alpha_bar(x, pts255, colour_restrict, alpha_restrict)
    if npad:
        # padded rows are solid (bar=False) and would defeat the all-
        # barred runtime skip below; their outputs are trimmed anyway
        bar = bar.at[n:].set(True)

    def _top_rows(chans, subsets, plist, levels, k, estimator="bounds"):
        return _estimate_topk_rows(xt, grid_n, sub, lane, chans, subsets,
                                   plist, levels, k, interpret, estimator)

    plist_full = _plist or tuple(range(nparts))
    plist16 = _plist or tuple(range(min(nparts, 16)))
    part_rows = {}
    if mode_mask & 0x0A:                               # modes 1, 3
        part_rows[1] = part_rows[3] = _top_rows(3, 2, plist_full, 8, topk)
    # mode 7's estimation pass moves inside its lax.cond (below): on
    # all-opaque batches the whole mode-7 leg is skipped at runtime
    if mode_mask & 0x04:                               # mode 2
        part_rows[2] = _top_rows(3, 3, plist_full, 4, topk)
    if mode_mask & 0x01:                               # mode 0
        if quality > 0.75 and not _plist:
            # only 16 partitions: full-fit them all at max quality, as the
            # reference quantizes every partition before shaking the
            # sorted best (bc7_body:582-709; kernels/bc7_full.py mirror)
            k0 = len(plist16)
            rows0 = jnp.broadcast_to(
                jnp.arange(k0, dtype=I32)[:, None, None, None],
                (k0, grid_n, sub, lane))
            part_rows[0] = (rows0, k0)
        else:
            part_rows[0] = _top_rows(3, 3, plist16, 8, topk)

    best_err = None
    best_cols = None
    any_unbarred = jnp.any(~bar)
    for m in BC7_MODES:
        if not (mode_mask >> m.mode) & 1:
            continue

        def _run_mode(m=m):
            if m.mode == 7 and (mode_mask & 0x80):
                # PCA-ranked shortlist (kernels/bc7_full.py mirror): the
                # bounds estimator misranks 4-channel blocks — PCA holds
                # the reference winner in the top-8 ~99% of the time
                # (scripts/diag_mode7_rank.py), so no x24 widening needed;
                # alpha content only (opaque batches skip this leg)
                rows_k = _top_rows(4, 2, plist_full, 4, topk,
                                   estimator="pca")
            else:
                rows_k = part_rows.get(m.mode)
            nparts_k = rows_k[1] if rows_k is not None else 0
            kern = partial(_mode_kernel, mode=m, quality=quality,
                           nparts_k=nparts_k,
                           plist_override=_plist, topk_override=_topk,
                           shake_override=_shake, uber_override=_uber)
            in_specs = [pl.BlockSpec((64, 1, sub, lane),
                                     lambda i: (0, i, 0, 0),
                                     memory_space=pltpu.VMEM)]
            inputs = [xt]
            if nparts_k:
                in_specs.append(pl.BlockSpec((nparts_k, 1, sub, lane),
                                             lambda i: (0, i, 0, 0),
                                             memory_space=pltpu.VMEM))
                inputs.append(rows_k[0])
            return pl.pallas_call(
                kern,
                grid=(grid_n,),
                in_specs=in_specs,
                out_specs=tuple(
                    pl.BlockSpec((1, sub, lane), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(5)),
                out_shape=tuple(
                    [jax.ShapeDtypeStruct((grid_n, sub, lane), U32)] * 4
                    + [jax.ShapeDtypeStruct((grid_n, sub, lane), F32)]),
                interpret=interpret,
            )(*inputs)

        maskable = m.mode in (6, 7) and (mode_mask & ~0xC0)
        if maskable:
            # runtime skip (VERDICT r4 item 1): when the COMBINED_ALPHA
            # restrictions bar modes 6/7 for EVERY block in the batch —
            # any fully-opaque, non-solid content under the driver's
            # default colour_restrict, the reference's own pruning
            # (bc7_body:1312-1380) — the whole kernel launch (and mode
            # 7's estimation pass) is skipped via lax.cond. Bit-identical
            # to running them: their errors were inf-masked anyway.
            def _dummy():
                z = jnp.zeros((grid_n, sub, lane), U32)
                return (z, z, z, z,
                        jnp.full((grid_n, sub, lane), 3.4e38, F32))

            outs = jax.lax.cond(any_unbarred, _run_mode, _dummy)
        else:
            outs = _run_mode()
        err = outs[4].reshape(total)
        if maskable:
            err = jnp.where(bar, jnp.float32(3.4e38), err)
        cols = [o.reshape(total) for o in outs[:4]]
        if best_err is None:
            best_err = err
            best_cols = cols
        else:
            take = err < best_err
            best_err = jnp.where(take, err, best_err)
            best_cols = [jnp.where(take, c, b)
                         for b, c in zip(best_cols, cols)]
    words = jnp.stack([c[:n] for c in best_cols], axis=1)
    return words, best_err[:n]

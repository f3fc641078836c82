"""Fast BC7 encoder: modes 1 + 6 (bc7enc16 analog).

TPU-first redesign of richgel999_bc7enc16.cpp: the same search structure —
alpha blocks go to mode 6 (handle_alpha_block, richgel:1390-1420), opaque
blocks race mode 6 against a two-subset mode 1 over estimated-best
partitions (handle_opaque_block, richgel:1422-1515) — but expressed as
batched compute-all + masked argmin instead of per-block branches:

  - PCA + least-squares endpoint fit      <- color_cell_compression
    (richgel:731-1024) via kernels/common.py
  - explicit p-bit enumeration            <- find_optimal_solution's p-bit
    rounding math (richgel:606-733): all 4 (p0,p1) combos evaluated, argmin
  - YCbCr perceptual metric               <- compute_color_distance_rgb(a)
    (richgel:325-355): the integer YCbCr transform is linear, so it is
    applied once to points and palettes and the weighted-L2 assign
    machinery evaluates the exact same distance (float instead of the
    reference's truncating >>8 fixed point)
  - mode-1 single-colour endpoint table   <- g_bc7_mode_1_optimal_endpoints
    (richgel:162-196) + pack_mode1_to_one_color (:357-404): per-subset
    mean-colour candidate raced against the fitted one (this also covers
    the mean-fallback of :1009-1021)
  - uber selector machinery               <- selector +-1 perturbation
    refits (richgel:896-974) and selector-scaling extrapolation for
    uber>=2 (:976-1006), each variant LSQ-refit and re-raced
  - partition estimation                  <- estimate_partition's
    bounds-axis approximate error (richgel:1026-1281): static unroll over
    the partition list, top-K full fits (the reference walks a sorted
    order with filterbank predictors and keeps 1; batched top-K over the
    same estimate is the TPU-shaped equivalent)
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables.bc7_tables import (BC7_MODES, WEIGHTS3, WEIGHTS4,
                                 partition_table)
from .bc7_common import _expand, pack_single, palette, quantize_pbit
from .common import (assign_projection, fit_line_iterative, lsq_refit,
                     masked_mean)

F32 = jnp.float32
I32 = jnp.int32

MODE1 = BC7_MODES[1]
MODE6 = BC7_MODES[6]
LEVELS3 = tuple(w / 64.0 for w in WEIGHTS3)
LEVELS4 = tuple(w / 64.0 for w in WEIGHTS4)

# Partition filterbank for fast mode: the most frequently winning 2-subset
# shapes (the same idea as bc7enc16's partition filterbank, richgel:139-149 —
# trading a large partition sweep for a curated shortlist).
FAST_PARTITIONS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                   16, 17, 18, 19, 21, 22, 23, 26)

RGB_W = (1.0, 1.0, 1.0)

# Integer YCbCr transform of compute_color_distance_rgb (richgel:325-349):
#   l = 109 r + 366 g + 37 b;  cr = (r<<9) - l;  cb = (b<<9) - l, all >>8.
# Expressed as one linear map (rows: l', cr', cb') over /256 scaling.
_YCBCR_M = np.array([[109.0, 366.0, 37.0],
                     [512.0 - 109.0, -366.0, -37.0],
                     [-109.0, -366.0, 512.0 - 37.0]], np.float32) / 256.0
# Channel weights in that space: the driver's perceptual mapping
# (richgel:1524-1533): 128*4, 64*4*(.5/(1-.2126))^2, 16*4*(.5/(1-.0722))^2,
# 32*4 -> (512, 103, 18, 128).
PERCEP_W = (512.0, 103.0, 18.0, 128.0)


def _to_metric(x, perceptual: bool):
    """Map RGB(A) (…,C) into the error-metric space (identity or YCbCr)."""
    if not perceptual:
        return x
    ycc = jnp.einsum("...c,dc->...d", x[..., :3], jnp.asarray(_YCBCR_M))
    if x.shape[-1] == 4:
        return jnp.concatenate([ycc, x[..., 3:]], axis=-1)
    return ycc


def _metric_weights(perceptual: bool, chans: int):
    w = PERCEP_W if perceptual else (1.0, 1.0, 1.0, 1.0)
    return jnp.asarray(w[:chans], F32)


def _merge(cand, best):
    """Per-block argmin merge of candidate tuples keyed on element 0."""
    if best is None:
        return cand
    bt = cand[0] < best[0]
    n = bt.shape[0]
    return tuple(
        jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), c, b)
        for c, b in zip(cand, best))


def _sel_variants(base, mn, mx, max_sel: int, uber: int):
    """Selector variants of the uber machinery.

    base (N,16) current selectors, mn/mx (N,1) min/max over the cell.
    Returns the +-1 perturbations (richgel:896-974) plus the scaling
    extrapolations for uber>=2 (richgel:976-1006).
    """
    up = (base == mn) & (base < max_sel)
    dn = (base == mx) & (base > 0)
    variants = [jnp.where(up, base + 1, base),
                jnp.where(dn, base - 1, base),
                jnp.where(up, base + 1, jnp.where(dn, base - 1, base))]
    if uber >= 2:
        q = (uber - 2) if uber >= 4 else 1
        basef = base.astype(F32)
        for ly in range(-q, 2):
            for hy in range(max_sel - 1, max_sel + q + 1):
                if ly == 0 and hy == max_sel:
                    continue
                v = jnp.floor(max_sel * (basef - ly) / (hy - ly) + 0.5)
                variants.append(jnp.clip(v, 0, max_sel).astype(I32))
    return variants


# --------------------------------------------------------------- mode 6 ---

def _pbit_analytic(e, bits: int):
    """Per-endpoint analytic p-bit choice (richgel:606-671): quantize the
    saturated endpoint under each p and keep the one with the lower
    unweighted rounding error in 0..255 space — the reference never races
    p-bits against the full palette. e (N,C) -> (q, deq (N,C), p (N,))."""
    e = jnp.clip(e, 0.0, 255.0)
    best = None
    for p in (0, 1):
        q, d = quantize_pbit(e, bits, p)
        err = jnp.sum((d.astype(F32) - e) ** 2, axis=-1)
        best = _merge((err, q, d, jnp.full(err.shape, p, I32)), best)
    return best[1], best[2], best[3]


def _pbit_analytic_shared(e0, e1, bits: int):
    """Shared-p-bit analog of :func:`_pbit_analytic` (richgel:676-708)."""
    e0 = jnp.clip(e0, 0.0, 255.0)
    e1 = jnp.clip(e1, 0.0, 255.0)
    best = None
    for p in (0, 1):
        q0, d0 = quantize_pbit(e0, bits, p)
        q1, d1 = quantize_pbit(e1, bits, p)
        err = (jnp.sum((d0.astype(F32) - e0) ** 2, axis=-1)
               + jnp.sum((d1.astype(F32) - e1) ** 2, axis=-1))
        best = _merge((err, q0, d0, q1, d1, jnp.full(err.shape, p, I32)),
                      best)
    return best[1], best[2], best[3], best[4], best[5]


def _quant6(pts_m, mask, e0, e1, mw, perceptual):
    """Mode-6 quantization: 7-bit + analytically chosen per-endpoint pbits,
    one exact-palette evaluation (find_optimal_solution structure)."""
    q0, d0, p0 = _pbit_analytic(e0, 7)
    q1, d1, p1 = _pbit_analytic(e1, 7)
    pal = _to_metric(palette(d0, d1, 4), perceptual)
    idx, err = assign_projection(pts_m, pal, LEVELS4, mw, mask)
    return (err, q0, q1, p0, p1, idx)


def encode_mode6(pts, perceptual: bool, uber: int):
    """pts (N,16,4) in 0..255 -> (err, words). uber per richgel:73-97."""
    n = pts.shape[0]
    mask = jnp.ones((n, 16), F32)
    unit4 = jnp.ones((4,), F32)
    mw = _metric_weights(perceptual, 4)
    pts_m = _to_metric(pts, perceptual)
    lv4 = jnp.asarray(LEVELS4, F32)

    e0, e1 = fit_line_iterative(pts, mask, LEVELS4, 2, unit4)
    best = _quant6(pts_m, mask, e0, e1, mw, perceptual)

    def refit_round(sel, best):
        e0r, e1r = lsq_refit(pts, mask, lv4[sel], e0, e1)
        return _merge(_quant6(pts_m, mask, e0r, e1r, mw, perceptual), best)

    # try_least_squares round from the current exact-palette assignment
    best = refit_round(best[5], best)
    if uber > 0:
        base = best[5]
        mn = jnp.min(base, axis=1, keepdims=True)
        mx = jnp.max(base, axis=1, keepdims=True)
        for v in _sel_variants(base, mn, mx, 15, uber):
            best = refit_round(v, best)
    err, q0, q1, p0, p1, idx = best
    words = pack_single(MODE6, jnp.zeros((n,), I32), q0[:, None, :],
                        q1[:, None, :], p0[:, None], p1[:, None], idx)
    return err, words


# --------------------------------------------------------------- mode 1 ---

@lru_cache(maxsize=1)
def _mode1_solid_table():
    """Optimal mode-1 endpoints per 8-bit channel value and shared p-bit for
    palette index 2 — g_bc7_mode_1_optimal_endpoints (richgel:162-196),
    derived at trace time instead of carried as a burned-in table."""
    w2 = WEIGHTS3[2]
    lo = np.arange(64)
    for_p = []
    for p in (0, 1):
        v = ((lo << 1) | p) << 1
        v = v | (v >> 7)                                # decoded 8-bit
        k = (v[:, None] * (64 - w2) + v[None, :] * w2 + 32) >> 6  # (lo,hi)
        c = np.arange(256)[:, None, None]
        err = (k[None] - c) ** 2                        # (256, 64, 64)
        flat = err.reshape(256, -1)
        am = flat.argmin(axis=1)
        for_p.append((am // 64, am % 64, flat.min(axis=1)))
    lo_t = np.stack([f[0] for f in for_p], 1).astype(np.int32)   # (256,2)
    hi_t = np.stack([f[1] for f in for_p], 1).astype(np.int32)
    err_t = np.stack([f[2] for f in for_p], 1).astype(np.float32)
    return lo_t, hi_t, err_t


def _mode1_solid_candidate(rgb, rgb_m, m, mw, perceptual):
    """Per-subset mean-colour candidate from the optimal endpoint table
    (pack_mode1_to_one_color richgel:357-404 + mean fallback :1009-1021).

    rgb (N,16,3) 0..255, m (N,16) subset mask -> (err, q0, q1, pb, idx).
    """
    lo_t, hi_t, err_t = (jnp.asarray(t) for t in _mode1_solid_table())
    n = rgb.shape[0]
    c = jnp.clip(jnp.round(masked_mean(rgb, m)), 0, 255).astype(I32)  # (N,3)
    errs = jnp.sum(err_t[c], axis=1)                    # (N,2)
    pb = jnp.argmin(errs, axis=1).astype(I32)           # (N,)
    sel = jnp.broadcast_to(pb[:, None, None], (n, 3, 1))
    q0 = jnp.take_along_axis(lo_t[c], sel, axis=2)[..., 0]
    q1 = jnp.take_along_axis(hi_t[c], sel, axis=2)[..., 0]
    d0 = _expand((q0 << 1) | pb[:, None], 7)
    d1 = _expand((q1 << 1) | pb[:, None], 7)
    pal = _to_metric(palette(d0, d1, 3), perceptual)
    idx, err = assign_projection(rgb_m, pal, LEVELS3, mw, m)
    return err, q0, q1, pb, idx


def _quant1_subset(rgb_m, m, e0, e1, mw, perceptual):
    """6-bit + analytically chosen shared p-bit for one mode-1 subset, one
    exact-palette evaluation (richgel:676-708)."""
    q0, d0, q1, d1, p = _pbit_analytic_shared(e0, e1, 6)
    pal = _to_metric(palette(d0, d1, 3), perceptual)
    idx, err = assign_projection(rgb_m, pal, LEVELS3, mw, m)
    return (err, q0, q1, p, idx)


def _estimate_partitions(rgb, plist):
    """Bounds-axis approximate error per candidate partition.

    rgb (N,16,3) -> (N, len(plist)) estimated error (richgel:1026-1205
    analog: project each subset on its bounds axis, quantize the projection
    to 8 steps, accumulate squared residuals).
    """
    ptab = partition_table(2)[list(plist)]          # (P,16)
    ests = []
    for pi in range(len(plist)):
        submask = jnp.asarray(ptab[pi], F32)        # (16,) 0/1
        est = jnp.zeros((rgb.shape[0],), F32)
        for s in (0.0, 1.0):
            m = (submask == s).astype(F32)          # (16,)
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = jnp.einsum("p,npc->nc", m, rgb) / cnt
            cen = (rgb - mean[:, None, :]) * m[None, :, None]
            lo = jnp.min(jnp.where(m[None, :, None] > 0, cen, 1e30), axis=1)
            hi = jnp.max(jnp.where(m[None, :, None] > 0, cen, -1e30), axis=1)
            axis = hi - lo                          # bounds axis (N,3)
            norm = jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                               1e-6)
            axis = axis / norm
            t = jnp.einsum("npc,nc->np", cen, axis)
            tmin = jnp.min(jnp.where(m[None, :] > 0, t, 1e30), axis=1)
            tmax = jnp.max(jnp.where(m[None, :] > 0, t, -1e30), axis=1)
            span = jnp.maximum(tmax - tmin, 1e-6)
            tq = jnp.round((t - tmin[:, None]) / span[:, None] * 7.0)
            tr = tq / 7.0 * span[:, None] + tmin[:, None]
            # residual = off-axis distance + on-axis quantization
            d2 = jnp.sum(cen * cen, axis=-1) - t * t
            est = est + jnp.sum((d2 + (t - tr) ** 2) * m[None, :], axis=1)
        ests.append(est)
    return jnp.stack(ests, axis=1)


def encode_mode1(rgb, perceptual: bool, plist, topk: int, uber: int):
    """rgb (N,16,3) 0..255 -> (err, words). Two subsets, 6-bit + shared pbit,
    3-bit indices; top-K partition race then uber refinement on the winner."""
    n = rgb.shape[0]
    unit3 = jnp.ones((3,), F32)
    mw = _metric_weights(perceptual, 3)
    rgb_m = _to_metric(rgb, perceptual)
    lv3 = jnp.asarray(LEVELS3, F32)
    est = _estimate_partitions(rgb, plist)                  # (N,P)
    _, top = jax.lax.top_k(-est, topk)                      # (N,K) into plist
    plist_arr = jnp.asarray(plist, I32)
    cand_parts = plist_arr[top]                             # (N,K)

    ptab = jnp.asarray(partition_table(2))                  # (64,16)
    best = None
    for k in range(topk):
        part = cand_parts[:, k]                             # (N,)
        sub = ptab[part]                                    # (N,16)
        qs0, qs1, pbs, errs = [], [], [], []
        idx_all = jnp.zeros((n, 16), I32)
        for s in range(2):
            m = (sub == s).astype(F32)
            e0, e1 = fit_line_iterative(rgb, m, LEVELS3, 2, unit3)
            s_best = _merge(
                _mode1_solid_candidate(rgb, rgb_m, m, mw, perceptual),
                _quant1_subset(rgb_m, m, e0, e1, mw, perceptual))
            err, q0, q1, p, idx = s_best
            errs.append(err)
            qs0.append(q0)
            qs1.append(q1)
            pbs.append(p)
            idx_all = jnp.where((sub == s), idx, idx_all)
        cand = (errs[0] + errs[1], jnp.stack(errs, 1), part,
                jnp.stack(qs0, 1), jnp.stack(qs1, 1), jnp.stack(pbs, 1),
                idx_all)
        best = _merge(cand, best)
    total, errs, part, q0, q1, pb, idx = best

    if uber > 0:
        # uber machinery on the winning partition, per subset
        sub = ptab[part]
        for s in range(2):
            m = (sub == s).astype(F32)
            mi = (sub == s)
            d0 = _expand((q0[:, s] << 1) | pb[:, s:s + 1], 7).astype(F32)
            d1 = _expand((q1[:, s] << 1) | pb[:, s:s + 1], 7).astype(F32)
            base = idx
            big = jnp.int32(1 << 20)
            mn = jnp.min(jnp.where(mi, base, big), axis=1, keepdims=True)
            mx = jnp.max(jnp.where(mi, base, -big), axis=1, keepdims=True)
            s_best = (errs[:, s], q0[:, s], q1[:, s], pb[:, s], idx)
            for v in _sel_variants(base, mn, mx, 7, uber):
                e0v, e1v = lsq_refit(rgb, m, lv3[v], d0, d1)
                err_v, q0v, q1v, pv, idxv = _quant1_subset(
                    rgb_m, m, e0v, e1v, mw, perceptual)
                s_best = _merge(
                    (err_v, q0v, q1v, pv, jnp.where(mi, idxv, idx)), s_best)
            err_s, q0s, q1s, ps, idx = s_best
            errs = errs.at[:, s].set(err_s)
            q0 = q0.at[:, s].set(q0s)
            q1 = q1.at[:, s].set(q1s)
            pb = pb.at[:, s].set(ps)
        total = errs[:, 0] + errs[:, 1]

    words = pack_single(MODE1, part, q0, q1, pb, pb, idx)
    return total, words


@partial(jax.jit, static_argnames=("fast", "perceptual"))
def encode_bc7_fast_blocks(blocks: jnp.ndarray, *, fast: bool = False,
                           perceptual: bool = True):
    """Encode (N,16,4) float RGBA blocks in [0,1] -> ((N,4) uint32, (N,) err).

    Image_CompressRichGel999BC7 analog with the reference driver's option
    mapping (richgel999_bc7enc16.cpp:73-97): uber level 4 unless ``fast``
    (then 0). Reported err is in the active metric's units (plain weighted
    squared error when ``perceptual=False``).
    """
    pts = blocks.astype(F32) * 255.0
    has_alpha = jnp.any(pts[:, :, 3] < 255.0 - 1e-3, axis=1)

    uber = 0 if fast else 4
    err6, words6 = encode_mode6(pts, perceptual, uber)

    plist = FAST_PARTITIONS if fast else tuple(range(64))
    topk = 2 if fast else 4
    err1, words1 = encode_mode1(pts[:, :, :3], perceptual, plist, topk, uber)
    # mode 1 cannot represent alpha: race only for opaque blocks
    err1 = jnp.where(has_alpha, jnp.inf, err1)

    use1 = err1 < err6
    words = jnp.where(use1[:, None], words1, words6)
    err = jnp.where(use1, err1, err6)
    return words, err

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
  - selector-refit "uber" rounds          <- uber_level selector
    perturbation + least squares refit (richgel:896-1006): re-fit from the
    exact-palette assignment, requantize, keep if better
  - partition estimation                  <- estimate_partition's
    bounds-axis approximate error (richgel:1026-1281): static unroll over
    the partition list, top-K full fits
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables.bc7_tables import (BC7_MODES, WEIGHTS3, WEIGHTS4,
                                 partition_table)
from .bc7_common import pack_single, palette, quantize_pbit
from .common import assign_nearest, fit_line_iterative, lsq_refit

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
# luma-dominant perceptual weighting (bc7enc16 defaults are YCbCr-space
# weights richgel:15-36; an RGB-space luma skew is the same intent)
PERCEP_W = (0.299 * 3, 0.587 * 3, 0.114 * 3)


def _quant6(pts, mask, e0, e1, weights):
    """Mode-6 quantization: 7-bit + per-endpoint pbit, all 4 combos."""
    best = None
    for p0 in (0, 1):
        for p1 in (0, 1):
            q0, d0 = quantize_pbit(e0, 7, p0)
            q1, d1 = quantize_pbit(e1, 7, p1)
            pal = palette(d0, d1, 4)
            idx, err = assign_nearest(pts, pal, weights, mask)
            cand = (err, q0, q1, jnp.full(err.shape, p0, I32),
                    jnp.full(err.shape, p1, I32), idx)
            if best is None:
                best = cand
            else:
                better = cand[0] < best[0]
                best = tuple(
                    jnp.where(better if b.ndim == 1 else better[:, None],
                              c, b) for c, b in zip(cand, best))
    return best


def encode_mode6(pts, weights, uber: int = 1):
    """pts (N,16,4) in 0..255 -> (err, words)."""
    n = pts.shape[0]
    mask = jnp.ones((n, 16), F32)
    w4 = jnp.asarray(weights + (1.0,), F32)
    e0, e1 = fit_line_iterative(pts, mask, LEVELS4, 2, w4)
    err, q0, q1, p0, p1, idx = _quant6(pts, mask, e0, e1, w4)
    for _ in range(uber):
        # selector-refit round: LSQ from the exact assignment, requantize
        alphas = jnp.asarray(LEVELS4, F32)[idx]
        e0r, e1r = lsq_refit(pts, mask, alphas, e0, e1)
        err2, q02, q12, p02, p12, idx2 = _quant6(pts, mask, e0r, e1r, w4)
        better = err2 < err
        bc = better[:, None]
        err = jnp.minimum(err, err2)
        q0 = jnp.where(bc, q02, q0)
        q1 = jnp.where(bc, q12, q1)
        p0 = jnp.where(better, p02, p0)
        p1 = jnp.where(better, p12, p1)
        idx = jnp.where(bc, idx2, idx)
        e0, e1 = e0r, e1r
    words = pack_single(MODE6, jnp.zeros((n,), I32), q0[:, None, :],
                        q1[:, None, :], p0[:, None], p1[:, None], idx)
    return err, words


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


def encode_mode1(rgb, weights, plist, topk: int):
    """rgb (N,16,3) 0..255 -> (err, words). Two subsets, 6-bit + shared pbit,
    3-bit indices."""
    n = rgb.shape[0]
    w3 = jnp.asarray(weights, F32)
    est = _estimate_partitions(rgb, plist)                  # (N,P)
    _, top = jax.lax.top_k(-est, topk)                      # (N,K) into plist
    plist_arr = jnp.asarray(plist, I32)
    cand_parts = plist_arr[top]                             # (N,K)

    ptab = jnp.asarray(partition_table(2))                  # (64,16)
    best = None
    for k in range(topk):
        part = cand_parts[:, k]                             # (N,)
        sub = ptab[part]                                    # (N,16)
        qs0 = []
        qs1 = []
        pbs = []
        total_err = jnp.zeros((n,), F32)
        idx_all = jnp.zeros((n, 16), I32)
        for s in range(2):
            m = (sub == s).astype(F32)
            e0, e1 = fit_line_iterative(rgb, m, LEVELS3, 2, w3)
            s_best = None
            for p in (0, 1):
                q0, d0 = quantize_pbit(e0, 6, p)
                q1, d1 = quantize_pbit(e1, 6, p)
                pal = palette(d0, d1, 3)
                idx, err = assign_nearest(rgb, pal, w3, m)
                cand = (err, q0, q1, jnp.full((n,), p, I32), idx)
                if s_best is None:
                    s_best = cand
                else:
                    bt = cand[0] < s_best[0]
                    s_best = tuple(
                        jnp.where(bt if b.ndim == 1 else bt[:, None], c, b)
                        for c, b in zip(cand, s_best))
            err, q0, q1, p, idx = s_best
            total_err = total_err + err
            qs0.append(q0)
            qs1.append(q1)
            pbs.append(p)
            idx_all = jnp.where((sub == s), idx, idx_all)
        cand = (total_err, part, jnp.stack(qs0, 1), jnp.stack(qs1, 1),
                jnp.stack(pbs, 1), idx_all)
        if best is None:
            best = cand
        else:
            bt = cand[0] < best[0]
            best = tuple(
                jnp.where(bt.reshape((n,) + (1,) * (b.ndim - 1)), c, b)
                for c, b in zip(cand, best))
    err, part, q0, q1, pb, idx = best
    words = pack_single(MODE1, part, q0, q1, pb, pb, idx)
    return err, words


@partial(jax.jit, static_argnames=("fast", "perceptual"))
def encode_bc7_fast_blocks(blocks: jnp.ndarray, *, fast: bool = False,
                           perceptual: bool = True):
    """Encode (N,16,4) float RGBA blocks in [0,1] -> ((N,4) uint32, (N,) err).

    Image_CompressRichGel999BC7 analog: default (uber) quality unless
    ``fast`` (richgel999_bc7enc16.cpp:73-97 option mapping).
    """
    pts = blocks.astype(F32) * 255.0
    n = pts.shape[0]
    w = PERCEP_W if perceptual else RGB_W
    has_alpha = jnp.any(pts[:, :, 3] < 255.0 - 1e-3, axis=1)

    uber = 1 if fast else 3
    err6, words6 = encode_mode6(pts, w, uber=uber)

    plist = FAST_PARTITIONS if fast else tuple(range(64))
    topk = 2 if fast else 4
    err1, words1 = encode_mode1(pts[:, :, :3], w, plist, topk)
    # mode 1 cannot represent alpha: race only for opaque blocks
    err1 = jnp.where(has_alpha, jnp.inf, err1)

    use1 = err1 < err6
    words = jnp.where(use1[:, None], words1, words6)
    err = jnp.where(use1, err1, err6)
    return words, err

"""BC1 / BC2+BC3-colour block encoder (batched jnp).

TPU-first redesign of the reference BCX colour engine
(amd_bcx_body.cpp: CompRGBABlock :1209-1297, CompressRGBBlockX :937-1182,
Refine/Refine3D :582-932, Clstr :258-378) and the BC1 packer
(amd_bcx_helpers.cpp:51-105). Differences by design (SURVEY.md §7 step 3):

  - No unique-colour qsort histogram (a CPU-only optimization; weights Rpt=1
    give identical math, amd_bcx_body.cpp:1242-1262). All 16 pixels are used.
  - The reference's ``for(;;)`` axis-refine loop becomes a *fixed* number of
    (assign -> least-squares refit) iterations (kernels/common.py).
  - The per-channel +/-step jitter refine (Refine, :582-806) becomes a static
    candidate sweep in quantized 565 space, evaluated against the *exact
    integer decode palette* (decode/bcn.py), so the encoder's error model is
    bit-identical to what a decoder reconstructs.
  - 3-colour vs 4-colour race (amd_bcx_helpers.cpp:66-90) is a masked select.
  - Punch-through alpha: pixels with A*255 < threshold are excluded from the
    fit and forced to index 3 of the 3-colour mode (amd_bcx_body.cpp:1223-1231,
    :269-270).

Everything is (N, ...)-batched; no per-block Python. ~O(16*4*(iters+candidates))
VPU flops per block, no data-dependent shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import bitpack
from ..decode.bcn import expand_565
from ..options import PERCEPTUAL_WEIGHTS
from .common import (assign_nearest, fit_line_iterative, lsq_refit,
                     principal_axis, project_extents)

F32 = jnp.float32
I32 = jnp.int32

LEVELS4 = (0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0)
LEVELS3 = (0.0, 0.5, 1.0)


def quantize_565(e: jnp.ndarray) -> jnp.ndarray:
    """Float RGB in 0..255 -> (N, 3) int32 of (5,6,5)-bit components."""
    r = jnp.clip(jnp.round(e[..., 0] * (31.0 / 255.0)), 0, 31)
    g = jnp.clip(jnp.round(e[..., 1] * (63.0 / 255.0)), 0, 63)
    b = jnp.clip(jnp.round(e[..., 2] * (31.0 / 255.0)), 0, 31)
    return jnp.stack([r, g, b], axis=-1).astype(I32)


def expand_q(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) int32 565 components -> (..., 3) int32 8-bit (bit replicate)."""
    r = (q[..., 0] << 3) | (q[..., 0] >> 2)
    g = (q[..., 1] << 2) | (q[..., 1] >> 4)
    b = (q[..., 2] << 3) | (q[..., 2] >> 2)
    return jnp.stack([r, g, b], axis=-1)


def palette_from_q(q0: jnp.ndarray, q1: jnp.ndarray,
                   four: bool) -> jnp.ndarray:
    """Exact integer decode palette from 565 components.

    (..., 3) x2 -> (..., K, 3) float32; K=4 (4-colour) or 3 (3-colour).
    Matches decode/bcn.py's rounding exactly.
    """
    e0 = expand_q(q0)
    e1 = expand_q(q1)
    if four:
        p2 = (2 * e0 + e1 + 1) // 3
        p3 = (e0 + 2 * e1 + 1) // 3
        pal = jnp.stack([e0, e1, p2, p3], axis=-2)
    else:
        p2 = (e0 + e1 + 1) // 2
        pal = jnp.stack([e0, e1, p2], axis=-2)
    return pal.astype(F32)


def _eval_q(pts, mask, q0, q1, four, weights):
    pal = palette_from_q(q0, q1, four)
    idx, err = assign_nearest(pts, pal, weights, mask)
    return idx, err


def _eval_q2(pts, mask, q0, q1, four, weights):
    """(idx, weighted err, unweighted err) — the unweighted sum rides the
    weighted assignment (indices are the decoder's, chosen weighted)."""
    pal = palette_from_q(q0, q1, four)                  # (N,K,3)
    idx, err = assign_nearest(pts, pal, weights, mask)  # idx (N,16)
    chosen = jnp.take_along_axis(pal, idx[:, :, None], axis=1)  # (N,16,3)
    d = pts - chosen
    uerr = jnp.sum(jnp.sum(d * d, axis=-1) * mask, axis=-1)
    return idx, err, uerr


def _tb_take(werr, uerr, best_w, best_u, eps: float):
    """Weighted-primary acceptance with an unweighted tie-break: a move
    wins outright below (1-eps)x the incumbent's weighted error, and wins
    a near-tie (within +-eps relative) iff it improves the UNWEIGHTED
    error. Both encoders optimize the perceptually weighted objective
    (block_utils.cpp:162-211) while the quality yardstick is unweighted
    PSNR; measured r5, the fw search beats the reference by ~3% on the
    weighted objective yet trailed PSNR by 0.014 dB — this recovers the
    metric without surrendering the objective."""
    win = werr < best_w * (1.0 - eps)
    tie = (werr <= best_w * (1.0 + eps)) & (uerr < best_u)
    return win | tie


def refine_565(pts, mask, q0, q1, four: bool, weights,
               passes: int = 1, tb_eps: float = 0.0):
    """Sequential per-channel +/-1 endpoint jitter in 565 space.

    Vectorized analog of Refine (amd_bcx_body.cpp:582-806): for each channel,
    try the 9 (dlo, dhi) in {-1,0,1}^2 moves, keep the argmin under the exact
    decode palette. Static unroll: passes * 3 channels * 9 candidates.
    ``tb_eps`` > 0 enables the unweighted tie-break (_tb_take).
    """
    maxq = jnp.array([31, 63, 31], I32)
    _, best_err, best_u = _eval_q2(pts, mask, q0, q1, four, weights)
    for _ in range(passes):
        for ch in range(3):
            for d0 in (-1, 0, 1):
                for d1 in (-1, 0, 1):
                    if d0 == 0 and d1 == 0:
                        continue
                    c0 = q0.at[..., ch].set(
                        jnp.clip(q0[..., ch] + d0, 0, maxq[ch]))
                    c1 = q1.at[..., ch].set(
                        jnp.clip(q1[..., ch] + d1, 0, maxq[ch]))
                    _, err, uerr = _eval_q2(pts, mask, c0, c1, four,
                                            weights)
                    if tb_eps > 0.0:
                        better = _tb_take(err, uerr, best_err, best_u,
                                          tb_eps)
                    else:
                        better = err < best_err
                    q0 = jnp.where(better[..., None], c0, q0)
                    q1 = jnp.where(better[..., None], c1, q1)
                    best_err = jnp.where(better, err, best_err)
                    best_u = jnp.where(better, uerr, best_u)
    return q0, q1, best_err


_CH_BITS = (5, 6, 5)


def _chan_palette_565(c0, c1, ch: int, four: bool):
    """Decoded palette values of ONE channel from its 565 components.

    c0/c1 (N,) int -> (N,K) int.
    """
    b = _CH_BITS[ch]
    e0 = (c0 << (8 - b)) | (c0 >> (2 * b - 8))
    e1 = (c1 << (8 - b)) | (c1 >> (2 * b - 8))
    if four:
        cols = [e0, e1, (2 * e0 + e1 + 1) // 3, (e0 + 2 * e1 + 1) // 3]
    else:
        cols = [e0, e1, (e0 + e1 + 1) // 2]
    return jnp.stack(cols, axis=-1)


def refine3d_565(pts, mask, q0, q1, four: bool, weights, steps: int = 1):
    """Joint 3-channel endpoint jitter — Refine3D (amd_bcx_body.cpp:808-932):
    ALL (2*steps+1)^6 simultaneous (lo, hi) moves of the three channels,
    scored under the exact decode palette via the reference's own
    per-channel distance decomposition (RmpErrG/RmpErr accumulation).

    ``steps`` is statically capped at 1 (729 combos) — the trace cost of
    the joint cube grows as (2s+1)^6.
    """
    steps = min(int(steps), 1)
    maxq = (31, 63, 31)
    rng_ = tuple(range(-steps, steps + 1))
    combos = tuple((d0, d1) for d0 in rng_ for d1 in rng_)
    D, Q = [], []
    for c in range(3):
        tabd, tabq = {}, {}
        for d in combos:
            c0 = jnp.clip(q0[..., c] + d[0], 0, maxq[c])
            c1 = jnp.clip(q1[..., c] + d[1], 0, maxq[c])
            pal_c = _chan_palette_565(c0, c1, c, four)      # (N,K)
            diff = pts[..., c][:, :, None] - pal_c[:, None, :].astype(F32)
            tabd[d] = weights[c] * diff * diff              # (N,16,K)
            tabq[d] = (c0, c1)
        D.append(tabd)
        Q.append(tabq)
    best = None
    for dg in combos:
        for db in combos:
            gb = D[1][dg] + D[2][db]
            for dr in combos:
                dist = gb + D[0][dr]
                err = jnp.sum(jnp.min(dist, axis=-1) * mask, axis=-1)
                cand = (err, Q[0][dr][0], Q[0][dr][1], Q[1][dg][0],
                        Q[1][dg][1], Q[2][db][0], Q[2][db][1])
                if best is None:
                    best = cand
                else:
                    bt = cand[0] < best[0]
                    best = tuple(jnp.where(bt, cc, bb)
                                 for cc, bb in zip(cand, best))
    err, r0, r1, g0, g1, b0, b1 = best
    return (jnp.stack([r0, g0, b0], -1), jnp.stack([r1, g1, b1], -1), err)


def pack_565(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) int32 565 components -> (...,) int32 packed 565 word."""
    return (q[..., 0] << 11) | (q[..., 1] << 5) | q[..., 2]


def _ramp_position_sweep(t, mask, tmin, tmax, levels):
    """8x8 endpoint-position grid search along the projection axis.

    The CompressRGBBlockX position sweep (amd_bcx_body.cpp:956-1008): the
    projection range is widened by 12.5% each side, then all 64 (lo, hi)
    pairs on a 0.025-normalized grid (with 2-step overshoot past the data
    bounds) are scored by 1-D nearest-ramp-level error. The normalized grid
    positions are constants, so this is a fully static 64-candidate race.
    t (N,16) projections; returns (lo, hi) (N,1) best positions.
    """
    lv = jnp.asarray(levels, F32)
    span = tmax - tmin                              # (N,1)
    scl0 = tmin - span * 0.125
    s = span * 1.25

    def ramp_err(lo, hi):
        pal_t = lo + lv[None, :] * (hi - lo)        # (N,K)
        d = (t[:, :, None] - pal_t[:, None, :]) ** 2
        return jnp.sum(jnp.min(d, axis=-1) * mask, axis=-1)

    def merge(best, cand):
        bt = cand[0] < best[0]
        return tuple(jnp.where(bt[:, None] if b.ndim == 2 else bt, c, b)
                     for c, b in zip(cand, best))

    # coarse 4x4 over the reference's 8x8 anchors, then a 3x3 one-step
    # local pass — within 0.003 dB of the full grid at ~40% of the evals
    best = None
    for l in range(0, 8, 2):
        for h in range(0, 8, 2):
            lp = 0.1 - 2 * 0.025 + l * 0.025        # ls + l*stp
            hp = 0.9 + 2 * 0.025 - h * 0.025        # he - h*stp
            lo = scl0 + lp * s
            hi = scl0 + hp * s
            cand = (ramp_err(lo, hi), lo, hi)
            best = cand if best is None else merge(best, cand)
    stp = 0.025 * s
    _, lo0, hi0 = best
    for dl in (-1.0, 0.0, 1.0):
        for dh in (-1.0, 0.0, 1.0):
            if dl == 0.0 and dh == 0.0:
                continue
            lo = lo0 + dl * stp
            hi = hi0 + dh * stp
            best = merge(best, (ramp_err(lo, hi), lo, hi))
    return best[1], best[2]


def _rederive_axis(pts, mask, mean, t, lo, hi, levels):
    """Axis re-derivation from the sweep-implied index vector — one round
    of the reference's convergence loop (amd_bcx_body.cpp:1139-1165): bin
    projections uniformly into ramp slots, centre the slot ids, and refit
    the direction as the LSQ of the 16-dim index vector."""
    k = len(levels)
    step = jnp.maximum((hi - lo) / (k - 1), 1e-6)            # (N,1)
    idx = jnp.clip(jnp.floor((t - lo + step * 0.5) / step), 0, k - 1)
    c = (idx - (k - 1) / 2.0) / (k - 1)                      # (N,16)
    cen = (pts - mean[:, None, :]) * mask[..., None]
    ln = jnp.sum(c * c * mask, axis=-1, keepdims=True)       # (N,1)
    crs = jnp.sum(cen * (c * mask)[..., None], axis=1)       # (N,3)
    nrm = jnp.sqrt(jnp.sum(crs * crs, axis=-1, keepdims=True))
    ok = (ln > 0) & (nrm > 1e-6)
    return jnp.where(ok, crs / jnp.maximum(nrm, 1e-6), 0.0), ok[:, 0]


def _fit_mode(pts, mask, four: bool, weights, iters: int,
              refine_passes: int, b3d: bool = False,
              sweep_rounds: int = 1, refine_both: bool = False,
              refine_each: bool = False, tb_eps: float = 0.0):
    levels = LEVELS4 if four else LEVELS3
    lv = jnp.asarray(levels, F32)
    mean, axis = principal_axis(pts, mask)
    t, tmin, tmax = project_extents(pts, mask, mean, axis)

    cands = []
    lo_sw, hi_sw = _ramp_position_sweep(t, mask, tmin, tmax, levels)
    pairs = [(tmin, tmax, axis), (lo_sw, hi_sw, axis)]
    # one extra round of the reference's convergence loop (bcx:951-998):
    # re-derive the axis from the sweep's implied index vector and sweep
    # again; raced as a third candidate rather than iterated to
    # convergence (sweep_rounds > 2 measured +0.000 dB on the corpus)
    for _ in range(sweep_rounds - 1):
        axis2, ok2 = _rederive_axis(pts, mask, mean, t, lo_sw, hi_sw,
                                    levels)
        axis2 = jnp.where(ok2[:, None], axis2, axis)
        t, tmin, tmax = project_extents(pts, mask, mean, axis2)
        lo_sw, hi_sw = _ramp_position_sweep(t, mask, tmin, tmax, levels)
        pairs.append((lo_sw, hi_sw, axis2))
    for lo, hi, ax in pairs:
        e0 = mean + lo * ax
        e1 = mean + hi * ax
        for _ in range(iters):
            pal = e0[..., None, :] + lv[:, None] * (e1 - e0)[..., None, :]
            idx, _ = assign_nearest(pts, pal, weights, mask)
            e0, e1 = lsq_refit(pts, mask, lv[idx], e0, e1)
        q0 = quantize_565(e0)
        q1 = quantize_565(e1)
        _, err = _eval_q(pts, mask, q0, q1, four, weights)
        cands.append((err, q0, q1))
    if refine_each:
        # refine EVERY raced candidate and argmin after — the pre-refine
        # ranking between the bounds/sweep/re-derived-axis fits can miss
        # the post-refine winner (same lesson as the BC7 keep2 race)
        ref_c = []
        for cerr, cq0, cq1 in cands:
            if b3d:
                rq0, rq1, rerr = refine3d_565(pts, mask, cq0, cq1, four,
                                              weights, steps=refine_passes)
            else:
                rq0, rq1, rerr = refine_565(pts, mask, cq0, cq1, four,
                                            weights, passes=refine_passes)
            ref_c.append((rerr, rq0, rq1))
        err, q0, q1 = ref_c[0]
        for cerr, cq0, cq1 in ref_c[1:]:
            bt = cerr < err
            q0 = jnp.where(bt[:, None], cq0, q0)
            q1 = jnp.where(bt[:, None], cq1, q1)
            err = jnp.minimum(cerr, err)
        idx, err, uerr = _eval_q2(pts, mask, q0, q1, four, weights)
        return q0, q1, idx, err, uerr
    err, q0, q1 = cands[0]
    for cerr, cq0, cq1 in cands[1:]:
        bt = cerr < err
        q0 = jnp.where(bt[:, None], cq0, q0)
        q1 = jnp.where(bt[:, None], cq1, q1)
        err = jnp.minimum(cerr, err)
    if b3d:
        # joint 3-channel cube (Refine3D, bcx:808-932; either/or dispatch
        # per the reference, bcx:1198-1202)
        q0, q1, err = refine3d_565(pts, mask, q0, q1, four, weights,
                                   steps=refine_passes)
    else:
        q0, q1, err = refine_565(pts, mask, q0, q1, four, weights,
                                 passes=refine_passes, tb_eps=tb_eps)
    if refine_both and not b3d:
        q0j, q1j, _ = refine3d_565(pts, mask, q0, q1, four, weights,
                                   steps=1)
        _, errj = _eval_q(pts, mask, q0j, q1j, four, weights)
        bt = errj < err
        q0 = jnp.where(bt[:, None], q0j, q0)
        q1 = jnp.where(bt[:, None], q1j, q1)
        err = jnp.minimum(errj, err)
    idx, err, uerr = _eval_q2(pts, mask, q0, q1, four, weights)
    return q0, q1, idx, err, uerr


@partial(jax.jit, static_argnames=(
    "use_alpha", "allow_three", "force_four_decode", "refinement_steps",
    "b3d_refinement", "weights", "_sweep_rounds", "_refine_both",
    "_refine_passes", "_refine_each", "_tb_eps"))
def encode_bc1_blocks(blocks: jnp.ndarray,
                      alpha_threshold: jnp.ndarray | float = 0.5,
                      *,
                      use_alpha: bool = False,
                      allow_three: bool = True,
                      force_four_decode: bool = False,
                      refinement_steps: int = 1,
                      b3d_refinement: bool = False,
                      weights: tuple = PERCEPTUAL_WEIGHTS,
                      _sweep_rounds: int = 1,
                      _refine_both: bool = False,
                      _refine_passes: int = 1,
                      _refine_each: bool = False,
                      _tb_eps: float = 0.05):
    """Encode (N, 16, C>=3) float blocks in [0,1] -> ((N, 2) uint32, (N,) err).

    ``force_four_decode``: BC2/BC3 colour-block mode — the decoder always uses
    4-colour interpolation, endpoint order carries no mode bit.
    ``allow_three``: race the 3-colour mode (BC1 only).
    Returned err is the weighted squared error in 0..255 space over opaque
    pixels (the reference returns the same per-block error and discards it at
    the image level, SURVEY.md §5 metrics; we keep it as a free output).
    """
    pts = blocks[..., :3].astype(F32) * 255.0
    n = pts.shape[0]
    w = jnp.asarray(weights, F32)
    if use_alpha and blocks.shape[-1] >= 4:
        opaque = (blocks[..., 3] * 255.0 >= alpha_threshold * 255.0)
        mask = opaque.astype(F32)
    else:
        opaque = jnp.ones(pts.shape[:-1], bool)
        mask = jnp.ones(pts.shape[:-1], F32)
    has_transparent = jnp.any(~opaque, axis=-1)

    iters = 2 + int(refinement_steps)
    passes = int(_refine_passes)

    q0_4, q1_4, idx4, err4, uerr4 = _fit_mode(
        pts, mask, True, w, iters, passes, b3d=b3d_refinement,
        sweep_rounds=_sweep_rounds, refine_both=_refine_both,
        refine_each=_refine_each, tb_eps=_tb_eps)

    if allow_three:
        q0_3, q1_3, idx3, err3, uerr3 = _fit_mode(
            pts, mask, False, w, iters, passes, b3d=b3d_refinement,
            sweep_rounds=_sweep_rounds, refine_both=_refine_both,
            refine_each=_refine_each, tb_eps=_tb_eps)
    else:
        q0_3, q1_3 = q0_4, q1_4
        idx3, err3 = idx4, jnp.full((n,), jnp.inf, F32)
        uerr3 = jnp.full((n,), jnp.inf, F32)

    # ---- pack 4-colour: requires packed c0 > c1 (amd_bcx_helpers.cpp:97-100).
    c0_4 = pack_565(q0_4)
    c1_4 = pack_565(q1_4)
    swap4 = c0_4 < c1_4
    a0_4 = jnp.where(swap4, c1_4, c0_4)
    a1_4 = jnp.where(swap4, c0_4, c1_4)
    remap4 = jnp.asarray([1, 0, 3, 2], I32)
    pidx4 = jnp.where(swap4[:, None], remap4[idx4], idx4)
    degenerate4 = (a0_4 == a1_4) & (not force_four_decode)

    # ---- pack 3-colour: requires packed c0 <= c1.
    c0_3 = pack_565(q0_3)
    c1_3 = pack_565(q1_3)
    swap3 = c0_3 > c1_3
    a0_3 = jnp.where(swap3, c1_3, c0_3)
    a1_3 = jnp.where(swap3, c0_3, c1_3)
    remap3 = jnp.asarray([1, 0, 2, 3], I32)
    pidx3 = jnp.where(swap3[:, None], remap3[idx3], idx3)
    # transparent pixels -> index 3 (amd_bcx_body.cpp:269-270)
    if use_alpha:
        pidx3 = jnp.where(opaque, pidx3, 3)

    if force_four_decode:
        use4 = jnp.ones((n,), bool)
    elif not allow_three:
        use4 = ~degenerate4
    else:
        if _tb_eps > 0.0:
            use4 = _tb_take(err4, uerr4, err3, uerr3, _tb_eps)
        else:
            use4 = err4 < err3
        use4 = use4 & ~degenerate4
        if use_alpha:
            use4 = use4 & ~has_transparent

    a0 = jnp.where(use4, a0_4, a0_3)
    a1 = jnp.where(use4, a1_4, a1_3)
    pidx = jnp.where(use4[:, None], pidx4, pidx3)
    err = jnp.where(use4, err4, err3)

    words = bitpack.zeros(n, 2)
    words = bitpack.field_or(words, a0, 0, 16)
    words = bitpack.field_or(words, a1, 16, 16)
    words = bitpack.pack_indices(words, pidx, 32, 2)
    return words, err


def encode_rgb_blocks(blocks, *, refinement_steps=1, b3d_refinement=False,
                      weights=PERCEPTUAL_WEIGHTS):
    """BC2/BC3 colour block: always 4-colour decode (Image_CompressAMDRGB
    SingleModeBlock analog, amd_bcx_helpers.cpp:142-179)."""
    return encode_bc1_blocks(
        blocks, use_alpha=False, allow_three=False, force_four_decode=True,
        refinement_steps=refinement_steps, b3d_refinement=b3d_refinement,
        weights=weights)

"""BC4/BC5/BC3-alpha scalar ramp encoder (batched jnp).

TPU-first redesign of the reference 1-D engine (amd_bcx_body.cpp:
CompBlock1X :1848-1868, CompBlock1 global interval search :1633-1832,
Refine1 hill-climb :1555-1607, Clstr1 :1452-1505) and the 8-point vs 6-point
ramp race + DXT5 index packing (amd_bcx_helpers.cpp:125-140, :32-46).

Instead of the reference's sorted-unique-value interval walk + hill climb,
we fit endpoints by least squares (fixed iterations) and then run a static
joint (dlo, dhi) jitter sweep in quantized 8-bit space against the *exact*
integer ramps of decode/bcn.py — compute-all + argmin, the TPU idiom
(SURVEY.md §7 step 2). Both ramp modes race:
  - 8-point (a0 > a1): 6 interpolated steps,
  - 6-point (a0 <= a1): 4 interpolated steps + literal 0 and 255
(amd_bcx_helpers.cpp:132-138).
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from .. import bitpack
from ..decode.bcn import bc4_palette

F32 = jnp.float32
I32 = jnp.int32

# interpolation weights of ramp slots 0..7 for the LSQ fit (slot k maps to
# a0 + w*(a1-a0)); 6-mode slots 6/7 are the literal 0/255 extremes.
W8 = np.asarray([0.0, 1.0, 1 / 7, 2 / 7, 3 / 7, 4 / 7, 5 / 7, 6 / 7], np.float32)  # np: keep package import backend-free
W6 = np.asarray([0.0, 1.0, 1 / 5, 2 / 5, 3 / 5, 4 / 5], np.float32)


def _exact_palette(a0: jnp.ndarray, a1: jnp.ndarray) -> jnp.ndarray:
    """(...,) int endpoints -> (..., 8) int palette, mode by a0<=>a1 order."""
    shape = a0.shape
    pal = bc4_palette(a0.reshape(-1), a1.reshape(-1))
    return pal.reshape(*shape, 8)


def _assign(vals: jnp.ndarray, pal: jnp.ndarray):
    """vals (..., 16), pal (..., 8) -> idx (..., 16) int32, err (...,)."""
    d = vals[..., :, None] - pal[..., None, :].astype(F32)
    dist = d * d
    idx = jnp.argmin(dist, axis=-1).astype(I32)
    err = jnp.sum(jnp.min(dist, axis=-1), axis=-1)
    return idx, err


def _lsq_scalar(vals, alphas, e0, e1, m=1.0):
    """1-D least-squares endpoint refit; ``m`` masks out pixels that sit on
    the 6-point mode's literal 0/255 slots."""
    q00 = jnp.sum(m * (1 - alphas) ** 2, axis=-1)
    q01 = jnp.sum(m * alphas * (1 - alphas), axis=-1)
    q11 = jnp.sum(m * alphas * alphas, axis=-1)
    b0 = jnp.sum(m * (1 - alphas) * vals, axis=-1)
    b1 = jnp.sum(m * alphas * vals, axis=-1)
    det = q00 * q11 - q01 * q01
    ok = jnp.abs(det) > 1e-6
    inv = 1.0 / jnp.where(ok, det, 1.0)
    n0 = (q11 * b0 - q01 * b1) * inv
    n1 = (q00 * b1 - q01 * b0) * inv
    return jnp.where(ok, n0, e0), jnp.where(ok, n1, e1)


def _fit_ramp(vals, weights_tbl, interp_slots: int, iters: int,
              literal_extremes: bool = False):
    """Float endpoint fit against one ramp family.

    ``weights_tbl``: (K,) slot weights for the interpolated slots.
    ``literal_extremes``: 6-point mode — the palette also contains literal
    0 and 255; pixels captured by those slots are masked out of the LSQ so
    the endpoints can hug the interior cluster (this is what makes the
    6-point mode win on blocks with outliers, amd_bcx_helpers.cpp:132-138).
    """
    weights_tbl = jnp.asarray(weights_tbl)  # np table -> traceable indexing
    e0 = jnp.min(vals, axis=-1)
    e1 = jnp.max(vals, axis=-1)
    w = weights_tbl[:interp_slots]
    for _ in range(iters):
        pal = e0[..., None] + w * (e1 - e0)[..., None]
        if literal_extremes:
            extremes = jnp.broadcast_to(
                jnp.asarray([0.0, 255.0], F32), pal.shape[:-1] + (2,))
            pal = jnp.concatenate([pal, extremes], axis=-1)
        d = vals[..., :, None] - pal[..., None, :]
        idx = jnp.argmin(d * d, axis=-1)
        interior = (idx < interp_slots).astype(F32)
        alphas = w[jnp.minimum(idx, interp_slots - 1)]
        e0, e1 = _lsq_scalar(vals, alphas, e0, e1,
                             interior if literal_extremes else 1.0)
    return e0, e1


def _sweep(vals, a0, a1, radius: int, want_eight: bool, rounds: int = 1):
    """Hill-climbing (d0, d1) jitter in 8-bit endpoint space, exact ramps.

    Vectorized analog of Refine1's move-table hill climb
    (amd_bcx_body.cpp:1555-1607): each round evaluates the (2r+1)^2 joint
    moves around the current best and recenters — static unroll, masked
    argmin, so blocks that already converged simply keep their best.
    Rounds after the first use radius 1: the wide radius only matters for
    escaping the seed's quantization, and the recenter step makes a second
    wide ring redundant (measured −0.000 dB on the corpus for 2.6x fewer
    sweep evaluations).
    """
    best_a0, best_a1 = a0, a1
    idx, best_err = _assign(vals, _exact_palette(a0, a1))
    best_idx = idx
    for r in range(rounds):
        rad = radius if r == 0 else 1
        c_a0, c_a1 = best_a0, best_a1
        for d0 in range(-rad, rad + 1):
            for d1 in range(-rad, rad + 1):
                if d0 == 0 and d1 == 0:
                    continue
                c0 = jnp.clip(c_a0 + d0, 0, 255)
                c1 = jnp.clip(c_a1 + d1, 0, 255)
                ok = (c0 > c1) if want_eight else (c0 <= c1)
                i2, e2 = _assign(vals, _exact_palette(c0, c1))
                e2 = jnp.where(ok, e2, jnp.inf)
                better = e2 < best_err
                best_a0 = jnp.where(better, c0, best_a0)
                best_a1 = jnp.where(better, c1, best_a1)
                best_idx = jnp.where(better[..., None], i2, best_idx)
                best_err = jnp.minimum(e2, best_err)
    return best_a0, best_a1, best_idx, best_err


def _best_of(r1, r2):
    a0a, a1a, ia, ea = r1
    a0b, a1b, ib, eb = r2
    better = eb < ea
    return (jnp.where(better, a0b, a0a), jnp.where(better, a1b, a1a),
            jnp.where(better[..., None], ib, ia), jnp.minimum(ea, eb))


@partial(jax.jit, static_argnames=("iters", "radius", "rounds"))
def encode_bc4_blocks(vals01: jnp.ndarray, *, iters: int = 3,
                      radius: int = 2, rounds: int = 2):
    """Encode (N, 16) float scalar blocks in [0,1] -> ((N,2) uint32, (N,) err).

    Races the 8-point and 6-point ramp modes like
    Image_CompressAMDAlphaSingleModeBlock (amd_bcx_helpers.cpp:125-140);
    each mode hill-climbs from two seeds (LSQ fit and min/max extremes) to
    escape the LSQ local minimum the pure refit converges to.
    """
    vals = vals01.astype(F32) * 255.0
    vmin = jnp.clip(jnp.round(jnp.min(vals, axis=-1)), 0, 255).astype(I32)
    vmax = jnp.clip(jnp.round(jnp.max(vals, axis=-1)), 0, 255).astype(I32)

    # --- 8-point mode: a0 > a1 (endpoints high, low)
    # seed race: score the LSQ-fit and min/max seeds once and hill-climb
    # only the winner (one sweep instead of two; the sweep from the worse
    # seed almost never produces the final winner)
    e0, e1 = _fit_ramp(vals, W8, 8, iters)
    hi = jnp.clip(jnp.round(jnp.maximum(e0, e1)), 0, 255).astype(I32)
    lo = jnp.clip(jnp.round(jnp.minimum(e0, e1)), 0, 255).astype(I32)
    # force a strict order for mode 8; equal endpoints handled by 6-mode race
    hi8 = jnp.where(hi > lo, hi, jnp.minimum(hi + 1, 255))
    vmax8 = jnp.where(vmax > vmin, vmax, jnp.minimum(vmax + 1, 255))
    _, e_fit = _assign(vals, _exact_palette(hi8, lo))
    _, e_mm = _assign(vals, _exact_palette(vmax8, vmin))
    mm = e_mm < e_fit
    s0 = jnp.where(mm, vmax8, hi8)
    s1 = jnp.where(mm, vmin, lo)
    a0_8, a1_8, idx8, err8 = _sweep(vals, s0, s1, radius, True, rounds)

    # --- 6-point mode: a0 <= a1 (+ literal 0/255 slots)
    e0, e1 = _fit_ramp(vals, W6, 6, iters, literal_extremes=True)
    lo6 = jnp.clip(jnp.round(jnp.minimum(e0, e1)), 0, 255).astype(I32)
    hi6 = jnp.clip(jnp.round(jnp.maximum(e0, e1)), 0, 255).astype(I32)
    # global trimmed-interval seeds (CompBlock1's sorted interval search,
    # amd_bcx_body.cpp:1633-1832): endpoints on (sorted[i], sorted[15-j])
    # let outlier pixels fall to the literal 0/255 slots. Race them and the
    # LSQ seed on initial error; sweep the winner once.
    sv = jnp.sort(vals, axis=-1)
    _, e_lsq = _assign(vals, _exact_palette(lo6, hi6))
    best_seed = (lo6, hi6, e_lsq)
    for i in (0, 1, 2):
        for j in (0, 1, 2):
            s0 = jnp.clip(jnp.round(sv[..., i]), 0, 255).astype(I32)
            s1 = jnp.clip(jnp.round(sv[..., 15 - j]), 0, 255).astype(I32)
            s1 = jnp.maximum(s1, s0)
            _, e = _assign(vals, _exact_palette(s0, s1))
            better = e < best_seed[2]
            best_seed = (jnp.where(better, s0, best_seed[0]),
                         jnp.where(better, s1, best_seed[1]),
                         jnp.minimum(e, best_seed[2]))
    a0_6, a1_6, idx6, err6 = _sweep(vals, best_seed[0], best_seed[1],
                                    radius, False, rounds)

    use8 = err8 <= err6
    a0 = jnp.where(use8, a0_8, a0_6)
    a1 = jnp.where(use8, a1_8, a1_6)
    idx = jnp.where(use8[..., None], idx8, idx6)
    err = jnp.where(use8, err8, err6)

    n = vals.shape[0]
    words = bitpack.zeros(n, 2)
    words = bitpack.field_or(words, a0, 0, 8)
    words = bitpack.field_or(words, a1, 8, 8)
    words = bitpack.pack_indices(words, idx, 16, 3)
    return words, err


def encode_bc2_alpha_blocks(vals01: jnp.ndarray):
    """Explicit 4-bit alpha block (Image_CompressAMDExplictAlphaSingleModeBlock,
    amd_bcx_helpers.cpp:107-123). Quantization reproduces the reference's
    integer rounding formula exactly."""
    c = jnp.clip(jnp.round(vals01 * 255.0), 0, 255).astype(I32)
    # reference rounding: (c + ((c>>4) < 8 ? 7 : 8) - (c>>4)) >> 4, clamped
    hi = c >> 4
    q = (c + jnp.where(hi < 8, 7, 8) - hi) >> 4
    q = jnp.minimum(q, 15)
    n = vals01.shape[0]
    words = bitpack.zeros(n, 2)
    words = bitpack.pack_indices(words, q, 0, 4)
    dec = q * 17
    err = jnp.sum((c - dec).astype(F32) ** 2, axis=-1)
    return words, err

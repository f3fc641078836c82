"""Shared batched endpoint-fitting machinery.

TPU-first reformulation of the reference's per-block scalar search engines:
  - PCA axis fit  <- FindAxis (amd_bcx_body.cpp:442-570) and the float
    covariance/eigen stack (amd_hdr_encode.cpp:1161-1327): here one batched
    covariance (einsum -> MXU) + fixed-iteration power iteration with a
    degenerate-axis fallback, no data-dependent branches.
  - Least-squares endpoint refit from index assignments <- the axis re-fit
    loop (amd_bcx_body.cpp:1034-1182) and bc7enc16's normal-equation solve
    (richgel999_bc7enc16.cpp:197-289): closed-form 2x2 solve, batched.
  - Nearest-palette assignment <- Clstr* (amd_bcx_body.cpp:258-378): one
    masked argmin over the palette axis.

Everything operates on ``(N, P, C)`` float32 with an optional ``(N, P)``
validity mask (punch-through alpha exclusion, amd_bcx_body.cpp:1223-1231;
BC7 subset membership). P = 16 pixels. All loops are static-length with
convergence expressed as masking, per the XLA compilation model.
"""
from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32
EPS = 1e-8


def masked_mean(pts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(N,P,C), (N,P) -> (N,C) mean over valid pixels (0 if none)."""
    cnt = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    return jnp.sum(pts * mask[..., None], axis=-2) / cnt


def principal_axis(pts: jnp.ndarray, mask: jnp.ndarray,
                   iters: int = 8) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dominant eigenvector of the masked covariance -> (mean (N,C), axis (N,C)).

    Fixed ``iters`` power-iteration steps; degenerate blocks (solid colour)
    fall back to the unit diagonal, mirroring the reference's degenerate
    1-D/2-D handling in FindAxis (amd_bcx_body.cpp:500-570) without branches.
    """
    c = pts.shape[-1]
    mean = masked_mean(pts, mask)
    centered = (pts - mean[..., None, :]) * mask[..., None]
    cov = jnp.einsum("...pc,...pd->...cd", centered, centered)
    v = jnp.ones(pts.shape[:-2] + (c,), F32)
    for _ in range(iters):
        v2 = jnp.einsum("...cd,...d->...c", cov, v)
        n = jnp.linalg.norm(v2, axis=-1, keepdims=True)
        v = jnp.where(n > EPS, v2 / jnp.maximum(n, EPS), v)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.full_like(v, 1.0 / (c ** 0.5))
    axis = jnp.where(n > EPS, v / jnp.maximum(n, EPS), fallback)
    return mean, axis


def project_extents(pts, mask, mean, axis):
    """Projections onto axis -> (t (N,P), tmin (N,1), tmax (N,1)) masked."""
    t = jnp.einsum("...pc,...c->...p", pts - mean[..., None, :], axis)
    big = jnp.float32(1e30)
    tmin = jnp.min(jnp.where(mask > 0, t, big), axis=-1, keepdims=True)
    tmax = jnp.max(jnp.where(mask > 0, t, -big), axis=-1, keepdims=True)
    tmin = jnp.where(tmin > tmax, 0.0, tmin)  # no valid pixels
    tmax = jnp.where(tmax < tmin, 0.0, tmax)
    return t, tmin, tmax


def assign_nearest(pts: jnp.ndarray, palette: jnp.ndarray,
                   chan_weights: jnp.ndarray, mask: jnp.ndarray):
    """Nearest palette entry per pixel.

    pts (..., P, C), palette (..., K, C), chan_weights (C,), mask (..., P)
    -> idx (..., P) int32, err (...,) total weighted squared error.
    """
    d = pts[..., :, None, :] - palette[..., None, :, :]     # (..., P, K, C)
    dist = jnp.einsum("...pkc,c->...pk", d * d, chan_weights)
    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    best = jnp.min(dist, axis=-1)
    err = jnp.sum(best * mask, axis=-1)
    return idx, err


def _midpoints(levels):
    return tuple((levels[j] + levels[j + 1]) * 0.5
                 for j in range(len(levels) - 1))


def project_t(pts, e0, e1, chan_weights, eps=1e-10):
    """Normalized line parameter t of each point onto segment e0->e1.

    pts (...,P,C), e0/e1 (...,C) -> t (...,P) with t=0 for degenerate
    segments. Metric is the diagonal ``chan_weights``.
    """
    dirv = (e1 - e0) * chan_weights
    l2 = jnp.sum(dirv * (e1 - e0), axis=-1, keepdims=True)      # (...,1)
    inv = jnp.where(l2 > eps, 1.0 / jnp.maximum(l2, eps), 0.0)
    return jnp.einsum("...pc,...c->...p", pts - e0[..., None, :],
                      dirv) * inv


def assign_levels(pts, e0, e1, levels, chan_weights, mask=None):
    """Exact nearest-level assignment on a collinear float palette.

    The palette ``e0 + levels[k] * (e1 - e0)`` lies exactly on a line, so
    the weighted-L2 argmin reduces to quantizing the 1-D projection t
    against the static midpoints between consecutive levels — O(K)
    compares instead of an (N,P,K,C) distance tensor. Returns
    (idx (...,P) int32, alphas (...,P), err (...,) masked total).
    """
    t = project_t(pts, e0, e1, chan_weights)
    idx = jnp.zeros(t.shape, jnp.int32)
    for m in _midpoints(levels):
        idx = idx + (t > m)
    lv = jnp.asarray(levels, F32)
    alphas = lv[idx]
    # exact residual: off-axis part + on-axis quantization
    d = pts - (e0[..., None, :]
               + alphas[..., None] * (e1 - e0)[..., None, :])
    dist = jnp.einsum("...pc,c->...p", d * d, chan_weights)
    if mask is None:
        err = jnp.sum(dist, axis=-1)
    else:
        err = jnp.sum(dist * mask, axis=-1)
    return idx, alphas, err


def assign_projection(pts, pal, levels, chan_weights, mask):
    """Projection-argmin on a near-collinear integer palette, exact error.

    pal (...,K,C) holds the EXACT (decoder-rounded) palette entries whose
    ideal positions are ``levels`` (static, ascending). The index is chosen
    by quantizing the projection onto the pal[0]->pal[K-1] axis (exact when
    entries are collinear; decoder rounding perturbs entries by <=0.5 LSB,
    so near-tie pixels may differ from a full race by an error <=~1 LSB^2).
    The returned error is computed against the exact selected entry.

    Returns idx (...,P) int32, err (...,) masked total.
    """
    e0 = pal[..., 0, :]
    e1 = pal[..., -1, :]
    t = project_t(pts, e0, e1, chan_weights)
    idx = jnp.zeros(t.shape, jnp.int32)
    for m in _midpoints(levels):
        idx = idx + (t > m)
    sel = jnp.take_along_axis(pal, idx[..., None], axis=-2)  # (...,P,C)
    d = pts - sel
    dist = jnp.einsum("...pc,c->...p", d * d, chan_weights)
    err = jnp.sum(dist * mask, axis=-1)
    return idx, err


def lsq_refit(pts: jnp.ndarray, mask: jnp.ndarray, alphas: jnp.ndarray,
              e0: jnp.ndarray, e1: jnp.ndarray):
    """Least-squares endpoints from per-pixel interpolation weights.

    Minimizes sum_i m_i || (1-a_i) e0 + a_i e1 - p_i ||^2 via the 2x2 normal
    equations (bc7enc16's compute_least_squares_endpoints_*,
    richgel999_bc7enc16.cpp:197-289, generalized to any channel count).
    Singular systems (all pixels on one endpoint) keep the incoming e0/e1.
    """
    m = mask
    a = alphas * m
    one_a = (1.0 - alphas) * m
    q00 = jnp.sum(one_a * one_a, axis=-1)
    q01 = jnp.sum(one_a * alphas * m, axis=-1)
    q11 = jnp.sum(a * alphas, axis=-1)
    b0 = jnp.einsum("...p,...pc->...c", one_a, pts)
    b1 = jnp.einsum("...p,...pc->...c", a, pts)
    det = q00 * q11 - q01 * q01
    ok = jnp.abs(det) > 1e-6
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    n0 = (q11[..., None] * b0 - q01[..., None] * b1) * inv_det[..., None]
    n1 = (q00[..., None] * b1 - q01[..., None] * b0) * inv_det[..., None]
    okc = ok[..., None]
    return jnp.where(okc, n0, e0), jnp.where(okc, n1, e1)


def fit_line_iterative(pts, mask, levels, iters: int, chan_weights):
    """Full endpoint fit: PCA init + (assign -> LSQ refit) iterations.

    ``levels``: (K,) static interpolation weights of the target palette
    (e.g. [0, 1/3, 2/3, 1] for BC1 4-colour). Returns float endpoints
    (e0, e1) each (..., C).
    """
    mean, axis = principal_axis(pts, mask)
    _, tmin, tmax = project_extents(pts, mask, mean, axis)
    e0 = mean + tmin * axis
    e1 = mean + tmax * axis
    for _ in range(iters):
        _, alphas, _ = assign_levels(pts, e0, e1, levels, chan_weights, mask)
        e0, e1 = lsq_refit(pts, mask, alphas, e0, e1)
    return e0, e1


def map_ids(top, plist):
    """Map top-k slot indices to static partition ids WITHOUT a gather.

    XLA gathers run on the TPU scalar core (a 256-entry table lookup cost
    more than an entire fused encode kernel, measured r3); a select chain
    over a <=64-entry static list is pure vector-unit elementwise work.
    Identity when ``plist`` is contiguous from 0.
    """
    if tuple(plist) == tuple(range(len(plist))):
        return top
    out = jnp.zeros_like(top)
    for j, p in enumerate(plist):
        if p:
            out = jnp.where(top == j, p, out)
    return out

"""Fused BC1 encoder as a Pallas TPU kernel.

The pure-XLA batched encoder (kernels/bc1.py) runs at a few percent of VPU
peak: each of its ~56 palette evaluations materializes (N,16,K) HBM
intermediates and the (N,16,C) layout leaves 124 of 128 lanes idle. This
kernel runs the ENTIRE per-block pipeline (PCA axis -> iterative LSQ ->
565 quantize -> jitter refine -> 3/4-colour race -> bit pack) inside one
VMEM-resident program, with blocks on the 128-wide lane axis:

  data layout (in-kernel): row c*16+p of a (64, T) f32 tile holds channel c
  of pixel p for T consecutive blocks — every arithmetic op is vectorized
  over T lanes at full width, there are no gathers (the K<=4 palette axis
  and the 16-pixel axis are statically unrolled), and nothing round-trips
  HBM between pipeline stages.

Semantics mirror kernels/bc1.py at default options (the reference
CompRGBABlock race, amd_bcx_helpers.cpp:51-105) and the output decodes
identically under decode/bcn.py; ties between equal-error candidates may
resolve differently than the XLA path (float association), so tests compare
achieved error, not bits.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..options import PERCEPTUAL_WEIGHTS

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

LEVELS4 = (0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0)
LEVELS3 = (0.0, 0.5, 1.0)
_EPS = 1e-8
TILE = 512


def _expand_q(qr, qg, qb):
    """565 components -> 8-bit (bit replication), int32 lanes."""
    r = (qr << 3) | (qr >> 2)
    g = (qg << 2) | (qg >> 4)
    b = (qb << 3) | (qb >> 2)
    return r, g, b


def _int_div3(x):
    """floor(x/3) for 0 <= x <= 1530 via multiply-shift (no idiv on VPU)."""
    return (x * 21846) >> 16


def _palette_int(q0, q1, four: bool):
    """Exact decode palette rows from 565 components.

    q0/q1: 3-tuples of (1,T) int32. Returns list of K palette entries,
    each a 3-tuple of (1,T) int32 — matches decode/bcn.py rounding.
    """
    e0 = _expand_q(*q0)
    e1 = _expand_q(*q1)
    if four:
        p2 = tuple(_int_div3(2 * a + b + 1) for a, b in zip(e0, e1))
        p3 = tuple(_int_div3(a + 2 * b + 1) for a, b in zip(e0, e1))
        return [e0, e1, p2, p3]
    pm = tuple((a + b + 1) >> 1 for a, b in zip(e0, e1))
    return [e0, e1, pm]


def _assign_int(xs, pal, w):
    """Nearest palette entry under weighted distance.

    xs: 3-tuple of (16,T) f32; pal: list of K 3-tuples of (1,T) int32.
    Returns idx (16,T) int32, err (1,T) f32.
    """
    best_d = None
    idx = None
    for k, entry in enumerate(pal):
        d = jnp.zeros_like(xs[0])
        for c in range(3):
            diff = xs[c] - entry[c].astype(F32)
            d = d + w[c] * diff * diff
        if best_d is None:
            best_d, idx = d, jnp.zeros_like(d, I32)
        else:
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            idx = jnp.where(take, k, idx)
    err = jnp.sum(best_d, axis=0, keepdims=True)
    return idx, err


def _fit(xs, levels, iters: int, w):
    """PCA + iterative LSQ line fit. xs: 3x(16,T) f32 in 0..255.

    Returns (e0, e1): 3-tuples of (1,T) f32 endpoints.
    """
    mean = [jnp.mean(x, axis=0, keepdims=True) for x in xs]
    cen = [x - m for x, m in zip(xs, mean)]
    cov = {}
    for a in range(3):
        for b in range(a, 3):
            cov[(a, b)] = jnp.sum(cen[a] * cen[b], axis=0, keepdims=True)
    v = [jnp.ones_like(mean[0]) for _ in range(3)]
    for _ in range(8):
        nv = [cov[(0, 0)] * v[0] + cov[(0, 1)] * v[1] + cov[(0, 2)] * v[2],
              cov[(0, 1)] * v[0] + cov[(1, 1)] * v[1] + cov[(1, 2)] * v[2],
              cov[(0, 2)] * v[0] + cov[(1, 2)] * v[1] + cov[(2, 2)] * v[2]]
        n = jnp.sqrt(nv[0] * nv[0] + nv[1] * nv[1] + nv[2] * nv[2])
        ok = n > _EPS
        inv = 1.0 / jnp.maximum(n, _EPS)
        v = [jnp.where(ok, a * inv, b) for a, b in zip(nv, v)]
    n = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    ok = n > _EPS
    inv = 1.0 / jnp.maximum(n, _EPS)
    axis = [jnp.where(ok, a * inv, 0.57735026) for a in v]

    t = sum(c * a for c, a in zip(cen, axis))           # (16,T)
    tmin = jnp.min(t, axis=0, keepdims=True)
    tmax = jnp.max(t, axis=0, keepdims=True)
    e0 = [m + tmin * a for m, a in zip(mean, axis)]
    e1 = [m + tmax * a for m, a in zip(mean, axis)]

    lv = [jnp.float32(l) for l in levels]
    for _ in range(iters):
        # float palette assign
        best_d = None
        alpha = None
        for k, l in enumerate(lv):
            d = jnp.zeros_like(xs[0])
            for c in range(3):
                p = e0[c] + l * (e1[c] - e0[c])
                diff = xs[c] - p
                d = d + w[c] * diff * diff
            if best_d is None:
                best_d, alpha = d, jnp.zeros_like(d) + l
            else:
                take = d < best_d
                best_d = jnp.where(take, d, best_d)
                alpha = jnp.where(take, l, alpha)
        one_a = 1.0 - alpha
        q00 = jnp.sum(one_a * one_a, axis=0, keepdims=True)
        q01 = jnp.sum(one_a * alpha, axis=0, keepdims=True)
        q11 = jnp.sum(alpha * alpha, axis=0, keepdims=True)
        det = q00 * q11 - q01 * q01
        okd = jnp.abs(det) > 1e-6
        invd = 1.0 / jnp.where(okd, det, 1.0)
        for c in range(3):
            b0 = jnp.sum(one_a * xs[c], axis=0, keepdims=True)
            b1 = jnp.sum(alpha * xs[c], axis=0, keepdims=True)
            n0 = (q11 * b0 - q01 * b1) * invd
            n1 = (q00 * b1 - q01 * b0) * invd
            e0[c] = jnp.where(okd, n0, e0[c])
            e1[c] = jnp.where(okd, n1, e1[c])
    return e0, e1


def _quant565(e):
    maxq = (31, 63, 31)
    return [jnp.clip(jnp.round(e[c] * (maxq[c] / 255.0)), 0,
                     maxq[c]).astype(I32) for c in range(3)]


def _refine(xs, q0, q1, four: bool, w, passes: int):
    """Sequential per-channel +/-1 jitter under the exact integer palette."""
    maxq = (31, 63, 31)
    _, best = _assign_int(xs, _palette_int(tuple(q0), tuple(q1), four), w)
    for _ in range(passes):
        for ch in range(3):
            for d0 in (-1, 0, 1):
                for d1 in (-1, 0, 1):
                    if d0 == 0 and d1 == 0:
                        continue
                    c0 = list(q0)
                    c1 = list(q1)
                    c0[ch] = jnp.clip(q0[ch] + d0, 0, maxq[ch])
                    c1[ch] = jnp.clip(q1[ch] + d1, 0, maxq[ch])
                    _, err = _assign_int(
                        xs, _palette_int(tuple(c0), tuple(c1), four), w)
                    take = err < best
                    best = jnp.where(take, err, best)
                    q0 = [jnp.where(take, a, b) for a, b in zip(c0, q0)]
                    q1 = [jnp.where(take, a, b) for a, b in zip(c1, q1)]
    return q0, q1


def _pack565(q):
    return (q[0] << 11) | (q[1] << 5) | q[2]


def _fit_mode(xs, four: bool, w, iters: int, passes: int):
    levels = LEVELS4 if four else LEVELS3
    e0, e1 = _fit(xs, levels, iters, w)
    q0 = _quant565(e0)
    q1 = _quant565(e1)
    q0, q1 = _refine(xs, q0, q1, four, w, passes)
    idx, err = _assign_int(xs, _palette_int(tuple(q0), tuple(q1), four), w)
    return q0, q1, idx, err


def _bc1_kernel(x_ref, w0_ref, w1_ref, err_ref, *, weights, iters, passes,
                allow_three):
    xs = tuple(x_ref[16 * c:16 * (c + 1), :].astype(F32) * 255.0
               for c in range(3))
    w = weights

    q0_4, q1_4, idx4, err4 = _fit_mode(xs, True, w, iters, passes)
    c0_4 = _pack565(q0_4)
    c1_4 = _pack565(q1_4)
    swap4 = c0_4 < c1_4
    a0_4 = jnp.where(swap4, c1_4, c0_4)
    a1_4 = jnp.where(swap4, c0_4, c1_4)
    # remap [1,0,3,2] == idx ^ 1
    pidx4 = jnp.where(swap4, idx4 ^ 1, idx4)
    degenerate4 = a0_4 == a1_4

    if allow_three:
        q0_3, q1_3, idx3, err3 = _fit_mode(xs, False, w, iters, passes)
        c0_3 = _pack565(q0_3)
        c1_3 = _pack565(q1_3)
        swap3 = c0_3 > c1_3
        a0_3 = jnp.where(swap3, c1_3, c0_3)
        a1_3 = jnp.where(swap3, c0_3, c1_3)
        # remap [1,0,2,3]: flip only indices < 2
        pidx3 = jnp.where(swap3 & (idx3 < 2), idx3 ^ 1, idx3)
        use4 = (err4 < err3) & ~degenerate4
        a0 = jnp.where(use4, a0_4, a0_3)
        a1 = jnp.where(use4, a1_4, a1_3)
        pidx = jnp.where(use4, pidx4, pidx3)
        err = jnp.where(use4, err4, err3)
    else:
        a0, a1, pidx, err = a0_4, a1_4, pidx4, err4

    w0_ref[:] = (a0.astype(U32) | (a1.astype(U32) << 16))
    wout = jnp.zeros_like(a0, U32)
    for p in range(16):
        wout = wout | (pidx[p:p + 1, :].astype(U32) << U32(2 * p))
    w1_ref[:] = wout
    err_ref[:] = err


@partial(jax.jit, static_argnames=("weights", "iters", "passes",
                                  "allow_three", "tile"))
def encode_bc1_blocks_pallas(blocks: jnp.ndarray,
                             weights: tuple = PERCEPTUAL_WEIGHTS,
                             iters: int = 3, passes: int = 1,
                             allow_three: bool = True, tile: int = TILE):
    """Fused-BC1 entry: (N,16,C>=3) float blocks in [0,1] -> ((N,2) u32, (N,) err).

    Opaque path only (punch-through alpha stays on the XLA kernel).
    """
    n = blocks.shape[0]
    npad = -n % tile
    x = blocks[..., :3].astype(F32)
    if npad:
        x = jnp.concatenate(
            [x, jnp.zeros((npad, 16, 3), F32)], axis=0)
    total = x.shape[0]
    # (N,16,3) -> rows c*16+p: (48, N)
    xt = x.transpose(2, 1, 0).reshape(48, total)

    grid = total // tile
    kern = partial(_bc1_kernel, weights=weights, iters=iters, passes=passes,
                   allow_three=allow_three)
    # CPU backend (tests) has no Mosaic: fall back to the interpreter
    interpret = jax.default_backend() == "cpu"
    w0, w1, err = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((48, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, total), U32),
            jax.ShapeDtypeStruct((1, total), U32),
            jax.ShapeDtypeStruct((1, total), F32),
        ),
        interpret=interpret,
    )(xt)
    words = jnp.stack([w0[0, :n], w1[0, :n]], axis=1)
    return words, err[0, :n]

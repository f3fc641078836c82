"""Fused fast-BC7 (modes 1+6) encoder as a Pallas TPU kernel.

Same lane-parallel design as bc1_pallas.py, covering the bc7enc16-analog
search of kernels/bc7_fast.py:

  - mode 6: 4-D PCA + iterative LSQ, all 4 p-bit combos against the exact
    16-entry palette, selector-refit rounds;
  - mode 1: bounds-axis error estimate over the partition list — the
    partition masks are COMPILE-TIME constants per pixel row, so the
    per-subset reductions are static row sums with no masking at all —
    then top-K partitions get exact masked fits (6-bit + shared p-bit);
  - alpha blocks race to mode 6 only; packing includes the anchor fixups
    (endpoint swap + index complement), with mode-1 index layouts emitted
    per anchor class {15, 2, 8, 6} and lane-selected.

Budgets mirror kernels/bc7_fast.py: fast -> 24-partition shortlist,
top-2, 1 refit round; default -> all 64, top-4, 3 refit rounds.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables.bc7_tables import ANCHOR2, P2, WEIGHTS3, WEIGHTS4
from .bc7_fast import FAST_PARTITIONS, PERCEP_W, RGB_W

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

TILE = 256
LV4 = tuple(w / 64.0 for w in WEIGHTS4)
LV3 = tuple(w / 64.0 for w in WEIGHTS3)
_EPS = 1e-8


# --------------------------------------------------------------- helpers --
def _put(cols, val, start, nbits):
    """Static-offset field OR into 4 uint32 lane columns."""
    v = val.astype(U32) & U32((1 << nbits) - 1)
    w, off = divmod(start, 32)
    cols[w] = cols[w] | (v << U32(off))
    if off + nbits > 32:
        cols[w + 1] = cols[w + 1] | (v >> U32(32 - off))
    return cols


def _lerp64(a, b, w):
    return (a * (64 - w) + b * w + 32) >> 6


def _sel_by_id(pid, table):
    """Per-lane gather from a small static table via select chain.

    pid (1,T) int32, table: python ints -> (1,T) int32. Values above 2^31
    (packed 3-subset partition masks) wrap to two's complement; later
    ``(v >> k) & m`` extractions are unaffected.
    """
    out = jnp.zeros_like(pid)
    for p, v in enumerate(table):
        if v:
            if v >= (1 << 31):
                v -= 1 << 32
            out = jnp.where(pid == p, v, out)
    return out


def _norm4(v):
    n = jnp.sqrt(sum(x * x for x in v))
    ok = n > _EPS
    inv = 1.0 / jnp.maximum(n, _EPS)
    return [jnp.where(ok, x * inv, f) for x, f in
            zip(v, [0.5, 0.5, 0.5, 0.5])], ok


# ------------------------------------------------------------- mode 6 -----
def _fit_line4(xs, iters, w):
    """4-channel PCA + LSQ fit against the 16-level palette."""
    chans = len(xs)
    mean = [jnp.mean(x, axis=0, keepdims=True) for x in xs]
    cen = [x - m for x, m in zip(xs, mean)]
    cov = {}
    for a in range(chans):
        for b in range(a, chans):
            cov[(a, b)] = jnp.sum(cen[a] * cen[b], axis=0, keepdims=True)

    def cv(a, b):
        return cov[(a, b)] if a <= b else cov[(b, a)]

    v = [jnp.ones_like(mean[0]) for _ in range(chans)]
    for _ in range(8):
        nv = [sum(cv(a, b) * v[b] for b in range(chans))
              for a in range(chans)]
        n = jnp.sqrt(sum(x * x for x in nv))
        ok = n > _EPS
        inv = 1.0 / jnp.maximum(n, _EPS)
        v = [jnp.where(ok, a * inv, b) for a, b in zip(nv, v)]
    axis, _ = _norm4(v)
    t = sum(c * a for c, a in zip(cen, axis))
    tmin = jnp.min(t, axis=0, keepdims=True)
    tmax = jnp.max(t, axis=0, keepdims=True)
    e0 = [m + tmin * a for m, a in zip(mean, axis)]
    e1 = [m + tmax * a for m, a in zip(mean, axis)]
    for _ in range(iters):
        alpha = _assign_float(xs, e0, e1, LV4, w)
        e0, e1 = _lsq_multi(xs, alpha, None, e0, e1)
    return e0, e1


def _assign_float(xs, e0, e1, levels, w, mask=None):
    best = None
    alpha = None
    for l in levels:
        d = jnp.zeros_like(xs[0])
        for c in range(len(xs)):
            p = e0[c] + l * (e1[c] - e0[c])
            diff = xs[c] - p
            d = d + w[c] * diff * diff
        if best is None:
            best, alpha = d, jnp.zeros_like(d) + l
        else:
            take = d < best
            best = jnp.where(take, d, best)
            alpha = jnp.where(take, l, alpha)
    return alpha


def _lsq_multi(xs, alpha, mask, e0, e1):
    m = mask if mask is not None else jnp.ones_like(alpha)
    one_a = (1.0 - alpha) * m
    a_m = alpha * m
    q00 = jnp.sum(one_a * (1.0 - alpha), axis=0, keepdims=True)
    q01 = jnp.sum(one_a * alpha, axis=0, keepdims=True)
    q11 = jnp.sum(a_m * alpha, axis=0, keepdims=True)
    det = q00 * q11 - q01 * q01
    ok = jnp.abs(det) > 1e-6
    inv = 1.0 / jnp.where(ok, det, 1.0)
    ne0, ne1 = [], []
    for c in range(len(xs)):
        b0 = jnp.sum(one_a * xs[c], axis=0, keepdims=True)
        b1 = jnp.sum(a_m * xs[c], axis=0, keepdims=True)
        n0 = (q11 * b0 - q01 * b1) * inv
        n1 = (q00 * b1 - q01 * b0) * inv
        ne0.append(jnp.where(ok, n0, e0[c]))
        ne1.append(jnp.where(ok, n1, e1[c]))
    return ne0, ne1


def _assign_exact(xs, d0, d1, wtab, w, mask=None):
    """Exact palette assign: d0/d1 dequantized int endpoints per channel.

    Returns idx (16,T) int32, err (1,T) f32 (masked sum).
    """
    best = None
    idx = None
    for k, wk in enumerate(wtab):
        d = jnp.zeros_like(xs[0])
        for c in range(len(xs)):
            p = _lerp64(d0[c], d1[c], wk).astype(F32)
            diff = xs[c] - p
            d = d + w[c] * diff * diff
        if best is None:
            best, idx = d, jnp.zeros_like(d, I32)
        else:
            take = d < best
            best = jnp.where(take, d, best)
            idx = jnp.where(take, k, idx)
    if mask is not None:
        best = best * mask
    return idx, jnp.sum(best, axis=0, keepdims=True)


def _quant_pbit(e, bits, p):
    """Float endpoint 0..255 -> (field, dequant) with pbit (int lanes)."""
    total = bits + 1
    scale = (1 << total) - 1
    wv = e * (scale / 255.0)
    q = jnp.clip(jnp.round((wv - p) * 0.5), 0, (1 << bits) - 1).astype(I32)
    full = (q << 1) | p
    deq = (full << (8 - total)) | (full >> (2 * total - 8))
    return q, deq


def _mode6(xs, w, uber):
    e0, e1 = _fit_line4(xs, 2, w)
    state = None
    for _ in range(uber + 1):
        for p0 in (0, 1):
            for p1 in (0, 1):
                q0s, d0s, q1s, d1s = [], [], [], []
                for c in range(4):
                    q0, d0 = _quant_pbit(e0[c], 7, p0)
                    q1, d1 = _quant_pbit(e1[c], 7, p1)
                    q0s.append(q0)
                    d0s.append(d0)
                    q1s.append(q1)
                    d1s.append(d1)
                idx, err = _assign_exact(xs, d0s, d1s, WEIGHTS4, w)
                cand = dict(err=err, q0=q0s, q1=q1s, idx=idx,
                            p0=jnp.zeros_like(err, I32) + p0,
                            p1=jnp.zeros_like(err, I32) + p1)
                if state is None:
                    state = cand
                else:
                    take = cand["err"] < state["err"]
                    state = {
                        k: ([jnp.where(take, a, b) for a, b in
                             zip(cand[k], state[k])]
                            if isinstance(cand[k], list)
                            else jnp.where(take, cand[k], state[k]))
                        for k in state}
        # selector refit for the next round
        lvl = jnp.zeros_like(xs[0])
        for k, l in enumerate(LV4):
            lvl = jnp.where(state["idx"] == k, l, lvl)
        e0, e1 = _lsq_multi(xs, lvl, None, e0, e1)
    return state


def _pack_mode6(st):
    # anchor fixup: pixel 0 index MSB must be 0
    idx = st["idx"]
    need = (idx[0:1] & 8) != 0
    idx = jnp.where(need, 15 - idx, idx)
    q0 = [jnp.where(need, b, a) for a, b in zip(st["q0"], st["q1"])]
    q1 = [jnp.where(need, a, b) for a, b in zip(st["q0"], st["q1"])]
    p0 = jnp.where(need, st["p1"], st["p0"])
    p1 = jnp.where(need, st["p0"], st["p1"])
    z = jnp.zeros_like(idx[0:1], U32)
    cols = [z, z, z, z]
    cols = _put(cols, jnp.zeros_like(p0) + 0x40, 0, 8)
    pos = 7
    for c in range(4):
        cols = _put(cols, q0[c], pos, 7)
        pos += 7
        cols = _put(cols, q1[c], pos, 7)
        pos += 7
    cols = _put(cols, p0, 63, 1)
    cols = _put(cols, p1, 64, 1)
    pos = 65
    for p in range(16):
        nb = 3 if p == 0 else 4
        cols = _put(cols, idx[p:p + 1], pos, nb)
        pos += nb
    return cols


# ------------------------------------------------------------- mode 1 -----
def _estimate(xs3, plist):
    """Bounds-axis error estimate per partition; masks are static."""
    ests = []
    for pid in plist:
        bits = P2[pid]
        est = jnp.zeros_like(xs3[0][0:1])
        for s in (0, 1):
            rows = [p for p in range(16) if ((bits >> p) & 1) == s]
            cnt = float(len(rows))
            mean = [sum(x[p:p + 1] for p in rows) / cnt for x in xs3]
            cen = [[x[p:p + 1] - mean[c] for p in rows]
                   for c, x in enumerate(xs3)]
            # bounds per channel
            lo = []
            hi = []
            for c in range(3):
                l = cen[c][0]
                h = cen[c][0]
                for r in cen[c][1:]:
                    l = jnp.minimum(l, r)
                    h = jnp.maximum(h, r)
                lo.append(l)
                hi.append(h)
            axis = [h - l for h, l in zip(hi, lo)]
            n = jnp.sqrt(sum(a * a for a in axis))
            inv = 1.0 / jnp.maximum(n, 1e-6)
            axis = [a * inv for a in axis]
            ts = [sum(cen[c][i] * axis[c] for c in range(3))
                  for i in range(len(rows))]
            tmin = ts[0]
            tmax = ts[0]
            for t in ts[1:]:
                tmin = jnp.minimum(tmin, t)
                tmax = jnp.maximum(tmax, t)
            span = jnp.maximum(tmax - tmin, 1e-6)
            for i, t in enumerate(ts):
                tq = jnp.round((t - tmin) / span * 7.0)
                tr = tq * (1.0 / 7.0) * span + tmin
                d2 = sum(cen[c][i] * cen[c][i] for c in range(3)) - t * t
                est = est + d2 + (t - tr) ** 2
        ests.append(est)
    return ests


def _topk_ids(ests, plist, k):
    """K smallest estimate ids per lane -> list of (1,T) int32 (partition id)."""
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


def _fit_line3_masked(xs3, mask_rows, iters, w):
    """Masked 3-channel PCA + LSQ fit (mask per pixel row, (1,T) each)."""
    m = jnp.concatenate(mask_rows, axis=0)                  # (16,T)
    cnt = jnp.maximum(jnp.sum(m, axis=0, keepdims=True), 1.0)
    mean = [jnp.sum(x * m, axis=0, keepdims=True) / cnt for x in xs3]
    cen = [(x - mn) * m for x, mn in zip(xs3, mean)]
    cov = {}
    for a in range(3):
        for b in range(a, 3):
            cov[(a, b)] = jnp.sum(cen[a] * cen[b], axis=0, keepdims=True)
    v = [jnp.ones_like(mean[0]) for _ in range(3)]
    for _ in range(8):
        nv = [cov[(0, 0)] * v[0] + cov[(0, 1)] * v[1] + cov[(0, 2)] * v[2],
              cov[(0, 1)] * v[0] + cov[(1, 1)] * v[1] + cov[(1, 2)] * v[2],
              cov[(0, 2)] * v[0] + cov[(1, 2)] * v[1] + cov[(2, 2)] * v[2]]
        n = jnp.sqrt(sum(x * x for x in nv))
        ok = n > _EPS
        inv = 1.0 / jnp.maximum(n, _EPS)
        v = [jnp.where(ok, a * inv, b) for a, b in zip(nv, v)]
    n = jnp.sqrt(sum(x * x for x in v))
    ok = n > _EPS
    inv = 1.0 / jnp.maximum(n, _EPS)
    axis = [jnp.where(ok, a * inv, 0.57735026) for a in v]
    t = sum(c * a for c, a in zip(cen, axis))
    big = jnp.float32(1e30)
    tmin = jnp.min(jnp.where(m > 0, t, big), axis=0, keepdims=True)
    tmax = jnp.max(jnp.where(m > 0, t, -big), axis=0, keepdims=True)
    tmin = jnp.where(tmin > tmax, 0.0, tmin)
    tmax = jnp.where(tmax < tmin, 0.0, tmax)
    e0 = [mn + tmin * a for mn, a in zip(mean, axis)]
    e1 = [mn + tmax * a for mn, a in zip(mean, axis)]
    for _ in range(iters):
        alpha = _assign_float(xs3, e0, e1, LV3, w)
        e0, e1 = _lsq_multi(xs3, alpha, m, e0, e1)
    return e0, e1


def _mode1(xs3, w, plist, topk):
    ests = _estimate(xs3, plist)
    cand_ids = _topk_ids(ests, plist, topk)
    state = None
    for pid in cand_ids:
        maskbits = _sel_by_id(pid, [P2[p] if p in plist else 0
                                    for p in range(64)])
        sub_rows = [((maskbits >> p) & 1) for p in range(16)]
        total = None
        qs = []
        idx_all = None
        for s in (0, 1):
            mrows = [(r == s).astype(F32) for r in sub_rows]
            e0, e1 = _fit_line3_masked(xs3, mrows, 2, w)
            m = jnp.concatenate(mrows, axis=0)
            sbest = None
            for pb in (0, 1):
                q0s, d0s, q1s, d1s = [], [], [], []
                for c in range(3):
                    q0, d0 = _quant_pbit(e0[c], 6, pb)
                    q1, d1 = _quant_pbit(e1[c], 6, pb)
                    q0s.append(q0)
                    d0s.append(d0)
                    q1s.append(q1)
                    d1s.append(d1)
                idx, err = _assign_exact(xs3, d0s, d1s, WEIGHTS3, w, mask=m)
                cand = (err, q0s, q1s, jnp.zeros_like(err, I32) + pb, idx)
                if sbest is None:
                    sbest = cand
                else:
                    take = cand[0] < sbest[0]
                    sbest = tuple(
                        ([jnp.where(take, a, b) for a, b in zip(cn, bs)]
                         if isinstance(cn, list) else jnp.where(take, cn, bs))
                        for cn, bs in zip(cand, sbest))
            err, q0s, q1s, pb, idx = sbest
            total = err if total is None else total + err
            qs.append((q0s, q1s, pb))
            sub_mask = jnp.concatenate(
                [(r == s).astype(I32) for r in sub_rows], axis=0)
            contrib = idx * sub_mask
            idx_all = contrib if idx_all is None else idx_all + contrib
        cand = dict(err=total, pid=pid, q=qs, idx=idx_all,
                    sub=sub_rows)
        if state is None:
            state = cand
        else:
            take = cand["err"] < state["err"]
            ns = {}
            ns["err"] = jnp.where(take, cand["err"], state["err"])
            ns["pid"] = jnp.where(take, cand["pid"], state["pid"])
            ns["idx"] = jnp.where(take, cand["idx"], state["idx"])
            ns["sub"] = [jnp.where(take, a, b)
                         for a, b in zip(cand["sub"], state["sub"])]
            ns["q"] = []
            for (aq0, aq1, apb), (bq0, bq1, bpb) in zip(cand["q"],
                                                        state["q"]):
                ns["q"].append((
                    [jnp.where(take, a, b) for a, b in zip(aq0, bq0)],
                    [jnp.where(take, a, b) for a, b in zip(aq1, bq1)],
                    jnp.where(take, apb, bpb)))
            state = ns
    return state


def _pack_mode1(st):
    idx = st["idx"]                                          # (16,T)
    sub_rows = st["sub"]                                     # 16 x (1,T)
    pid = st["pid"]
    anchor = _sel_by_id(pid, list(ANCHOR2))
    (q00, q01, pb0), (q10, q11, pb1) = st["q"]

    # subset-0 fixup (anchor pixel 0)
    need0 = (idx[0:1] & 4) != 0
    in0 = jnp.concatenate([(r == 0).astype(I32) for r in sub_rows], axis=0)
    idx = jnp.where((need0 & (in0 > 0)), 7 - idx, idx)
    q00, q01 = ([jnp.where(need0, b, a) for a, b in zip(q00, q01)],
                [jnp.where(need0, a, b) for a, b in zip(q00, q01)])
    # subset-1 fixup (anchor = ANCHOR2[pid])
    a_idx = jnp.zeros_like(idx[0:1])
    for p in range(16):
        a_idx = jnp.where(anchor == p, idx[p:p + 1], a_idx)
    need1 = (a_idx & 4) != 0
    in1 = 1 - in0
    idx = jnp.where((need1 & (in1 > 0)), 7 - idx, idx)
    q10, q11 = ([jnp.where(need1, b, a) for a, b in zip(q10, q11)],
                [jnp.where(need1, a, b) for a, b in zip(q10, q11)])

    z = jnp.zeros_like(idx[0:1], U32)
    cols = [z, z, z, z]
    cols = _put(cols, jnp.zeros_like(pid) + 2, 0, 2)
    cols = _put(cols, pid, 2, 6)
    pos = 8
    for c in range(3):
        for ep in (q00[c], q01[c], q10[c], q11[c]):
            cols = _put(cols, ep, pos, 6)
            pos += 6
    cols = _put(cols, pb0, 80, 1)
    cols = _put(cols, pb1, 81, 1)
    # index field: 4 anchor classes, static layouts, lane-select
    base = cols
    out = [z, z, z, z]
    for a in (15, 2, 8, 6):
        cls = [z, z, z, z]
        pos = 82
        for p in range(16):
            nb = 2 if p in (0, a) else 3
            cls = _put(cls, idx[p:p + 1], pos, nb)
            pos += nb
        match = anchor == a
        out = [jnp.where(match, b | c, b) for b, c in zip(out, cls)]
    return [b | o for b, o in zip(base, out)]


# --------------------------------------------------------------- kernel ---
def _bc7fast_kernel(x_ref, w0, w1, w2, w3, err_ref, *, weights, fast,
                    plist_override=None, topk_override=None):
    xs = [x_ref[16 * c:16 * (c + 1), :].astype(F32) * 255.0
          for c in range(4)]
    wq = weights + (1.0,)
    has_alpha = jnp.min(xs[3], axis=0, keepdims=True) < 254.999

    uber = 1 if fast else 3
    st6 = _mode6(xs, wq, uber)
    cols6 = _pack_mode6(st6)

    plist = plist_override or (FAST_PARTITIONS if fast else tuple(range(64)))
    topk = topk_override or (2 if fast else 4)
    st1 = _mode1(xs[:3], weights, plist, topk)
    cols1 = _pack_mode1(st1)

    err1 = jnp.where(has_alpha, jnp.float32(3.4e38), st1["err"])
    use1 = err1 < st6["err"]
    cols = [jnp.where(use1, a, b) for a, b in zip(cols1, cols6)]
    w0[:] = cols[0]
    w1[:] = cols[1]
    w2[:] = cols[2]
    w3[:] = cols[3]
    err_ref[:] = jnp.where(use1, err1, st6["err"])


@partial(jax.jit, static_argnames=("fast", "perceptual", "tile",
                                  "_plist", "_topk"))
def encode_bc7_fast_blocks_pallas(blocks: jnp.ndarray, *, fast: bool = False,
                                  perceptual: bool = True, tile: int = TILE,
                                  _plist=None, _topk=None):
    """(N,16,4) float RGBA blocks in [0,1] -> ((N,4) uint32, (N,) err)."""
    n = blocks.shape[0]
    npad = -n % tile
    x = blocks[..., :4].astype(F32)
    if npad:
        pad = jnp.zeros((npad, 16, 4), F32).at[..., 3].set(1.0)
        x = jnp.concatenate([x, pad], axis=0)
    total = x.shape[0]
    xt = x.transpose(2, 1, 0).reshape(64, total)
    grid = total // tile
    w = PERCEP_W if perceptual else RGB_W
    kern = partial(_bc7fast_kernel, weights=tuple(w), fast=fast,
                   plist_override=_plist, topk_override=_topk)
    interpret = jax.default_backend() == "cpu"
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((64, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM) for _ in range(5)),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((1, total), U32)] * 4
            + [jax.ShapeDtypeStruct((1, total), F32)]),
        interpret=interpret,
    )(xt)
    words = jnp.stack([o[0, :n] for o in outs[:4]], axis=1)
    return words, outs[4][0, :n]

"""BC6H HDR encoder (batched jnp, signed + unsigned).

TPU-first redesign of BC6HBlockEncoder::CompressBlock
(amd_bc6h_body.cpp:1521-1651): the reference runs FindBestPattern over the
1-region case and all 32 2-region shapes with a 4000-try float quantizer
(optQuantAnD_f, amd_hdr_encode.cpp:1427), then EncodePattern sweeps the
candidate modes with a delta-transform losslessness gate. Here:

  - shape search     -> one float line-fit per (shape, subset) in the
    *unquantized work domain* (u = half-bits * 64/31, the exact inverse of
    finish_unquantizeF16's 31/64 scaling, bc6h:1039-1049), ranked by fit
    residual, top-K shapes kept (the FindBestPattern running-best,
    bc6h:1593-1632, as a static top-k);
  - mode sweep       -> every enabled mode evaluated on the kept shapes;
    transformed modes apply the integer delta-fit predicate (endpts_fit,
    bc6h:493-507) and are masked out on overflow; untransformed modes
    10 / 11 always fit, so a valid encoding always exists (the reference's
    solid-red fallback, bc6h:118, becomes unreachable);
  - quantize         -> closed-form: q = (u * 2^prec + 0x8000) >> 16 (and
    the signed/magnitude variant), no search tables;
  - error metric     -> exact integer decode pipeline (unquantize ->
    palette -> finish) in half-bit space, matching decode/bc6h.py bit-for-bit.

The mode-mask option is honoured (the reference drops it via an
argument-order bug, amd_bc6h_compressor.cpp:28 — documented, not copied).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import bitpack
from ..decode.bc6h import _finish, _unquantize
from ..tables.bc6h_tables import (BC6H_MODES, LAYOUTS, ONE_REGION_INDEX_BIT,
                                  TWO_REGION_INDEX_BIT, TWO_REGION_SHAPE_BIT)
from ..tables.bc7_tables import (ANCHOR2, WEIGHTS3, WEIGHTS4, partition_table)
from .common import fit_line_iterative

F32 = jnp.float32
I32 = jnp.int32

LEVELS3 = tuple(w / 64.0 for w in WEIGHTS3)
LEVELS4 = tuple(w / 64.0 for w in WEIGHTS4)

# distinct subset-1 anchor pixels across the 32 two-region shapes
_ANCHOR_CLASSES = (2, 8, 15)

# representative mode objects for region-dependent helpers (_swap_for_anchors
# reads only .regions)
_TWO_ANY = next(m for m in BC6H_MODES if m.regions == 2)
_ONE_ANY = next(m for m in BC6H_MODES if m.regions == 1)


def f32_to_half_int(x: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """float32 -> int32 half representation.

    unsigned: half bits clamped to [0, 0x7BFF] (negatives -> 0);
    signed: sign * magnitude-bits, magnitude clamped to 0x7BFF
    (the float->half conversion of bc6h:1539-1573)."""
    h = jax.lax.bitcast_convert_type(
        jnp.clip(x, -65504.0, 65504.0).astype(jnp.float16),
        jnp.uint16).astype(I32)
    mag = h & 0x7FFF
    neg = (h & 0x8000) != 0
    if signed:
        return jnp.where(neg, -mag, mag)
    return jnp.where(neg, 0, mag)


def _to_work(h: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """half-int -> float work domain (inverse of finish: * 64/31 or 32/31)."""
    if signed:
        return h.astype(F32) * (32.0 / 31.0)
    return h.astype(F32) * (64.0 / 31.0)


def _quantize(u: jnp.ndarray, prec: int, signed: bool) -> jnp.ndarray:
    """Work-domain float endpoint -> prec-bit signed/unsigned field value."""
    if not signed:
        uq = jnp.clip(jnp.round(u), 0, 0xFFFF).astype(I32)
        if prec >= 15:
            return jnp.clip(uq, 0, (1 << prec) - 1)
        return jnp.clip((uq * (1 << prec) + 0x8000) >> 16, 0,
                        (1 << prec) - 1)
    uq = jnp.clip(jnp.round(u), -0x7FFF, 0x7FFF).astype(I32)
    if prec >= 16:
        return uq
    mx = (1 << (prec - 1)) - 1
    mag = jnp.abs(uq)
    q = jnp.clip((mag * (1 << (prec - 1)) + 0x4000) >> 15, 0, mx)
    return jnp.where(uq < 0, -q, q)


def _unquantize_dyn(q, prec_arr, signed, precs):
    """Unquantize with a per-block precision (select over the static set)."""
    out = None
    for p in precs:
        u = _unquantize(q, p, signed)
        sel = (prec_arr == p)
        sel = sel.reshape(sel.shape + (1,) * (q.ndim - sel.ndim))
        out = u if out is None else jnp.where(sel, u, out)
    return out


def _palette_err_u(h_pts, mask, u0, u1, signed, index_bits: int):
    """Exact decode-path palette evaluation from unquantized endpoints.

    h_pts (N,16,3) half-int targets; u0/u1 (N,3) UNQUANTIZED endpoints.
    Returns (err (N,), idx (N,16)). Error = squared diff in half-int space.
    """
    u0 = u0[:, None, :]                                   # (N,1,3)
    u1 = u1[:, None, :]
    wt = jnp.asarray(WEIGHTS3 if index_bits == 3 else WEIGHTS4, I32)
    k = wt.shape[0]
    v = (u0[:, :, None] * (64 - wt)[None, None, :, None]
         + u1[:, :, None] * wt[None, None, :, None] + 32) >> 6   # (N,1,K,3)
    pal = _finish(v, signed)[:, 0]                         # (N,K,3)
    # compare in signed-magnitude-decoded integer space
    if signed:
        dec = jnp.where(pal >= 0x8000, -(pal & 0x7FFF), pal)
        tgt = h_pts
    else:
        dec = pal
        tgt = h_pts
    d = tgt[:, :, None, :].astype(F32) - dec[:, None, :, :].astype(F32)
    dist = jnp.sum(d * d, axis=-1)                         # (N,16,K)
    idx = jnp.argmin(dist, axis=-1).astype(I32)
    err = jnp.sum(jnp.min(dist, axis=-1) * mask, axis=-1)
    return err, idx


def _palette_err(h_pts, mask, q0, q1, prec, signed, index_bits: int):
    """Exact decode-path palette evaluation (static precision)."""
    return _palette_err_u(h_pts, mask, _unquantize(q0, prec, signed),
                          _unquantize(q1, prec, signed), signed, index_bits)


def _delta_ok(d: jnp.ndarray, bits: int) -> jnp.ndarray:
    lo = -(1 << (bits - 1))
    hi = (1 << (bits - 1)) - 1
    return (d >= lo) & (d <= hi)


_SHAKE_DELTAS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                 (1, -1), (1, 0), (1, 1))


def _shake_q(h_pts, mask, q0, q1, prec_arr, signed, index_bits: int, idx,
             rounds: int, precs):
    """Quantized-space endpoint shaker — the BC6H analog of ep_shaker_HD /
    ep_shaker_2_d float (amd_hdr_encode.cpp:2280+, 2616+): sweep each
    channel's endpoint-code pair over a +-1 cube with the current indices
    fixed, keep per-channel argmin, then requantize indices against the
    exact decode palette and iterate. All error is decode-true half-space.

    Runs on the RACE WINNER only (the reference shakes only its sorted
    best pattern, amd_bc6h_body.cpp:643-709), so the precision is
    per-block data: ``prec_arr`` (N,) selects from the static ``precs``.

    q0/q1 (N,3) prec-bit codes (signed: sign-magnitude ints). Returns
    (err, q0, q1, idx).
    """
    wt = jnp.asarray(WEIGHTS3 if index_bits == 3 else WEIGHTS4, I32)
    if signed:
        qlo = -jnp.asarray([(1 << (p - 1)) - 1 for p in precs], I32)
        qhi = -qlo
    else:
        qlo = jnp.zeros((len(precs),), I32)
        qhi = jnp.asarray([(1 << p) - 1 for p in precs], I32)
    sel = jnp.stack([(prec_arr == p) for p in precs], -1)   # (N,len)
    qlo_a = jnp.sum(jnp.where(sel, qlo, 0), axis=-1)        # (N,)
    qhi_a = jnp.sum(jnp.where(sel, qhi, 0), axis=-1)
    err = None
    for _ in range(rounds):
        wk = wt[idx]                                       # (N,16)
        for c in range(3):
            q0c, q1c = q0[:, c], q1[:, c]

            def ch_err(a, b, wk=wk, c=c):
                u0 = _unquantize_dyn(a, prec_arr, signed, precs)[:, None]
                u1 = _unquantize_dyn(b, prec_arr, signed, precs)[:, None]
                v = (u0 * (64 - wk) + u1 * wk + 32) >> 6
                pal = _finish(v, signed)
                if signed:
                    pal = jnp.where(pal >= 0x8000, -(pal & 0x7FFF), pal)
                d = h_pts[..., c].astype(F32) - pal.astype(F32)
                return jnp.sum(d * d * mask, axis=-1)

            best_e = ch_err(q0c, q1c)
            b0, b1 = q0c, q1c
            for da, db in _SHAKE_DELTAS:
                nq0 = jnp.clip(q0c + da, qlo_a, qhi_a)
                nq1 = jnp.clip(q1c + db, qlo_a, qhi_a)
                e = ch_err(nq0, nq1)
                bt = e < best_e
                best_e = jnp.where(bt, e, best_e)
                b0 = jnp.where(bt, nq0, b0)
                b1 = jnp.where(bt, nq1, b1)
            q0 = q0.at[:, c].set(b0)
            q1 = q1.at[:, c].set(b1)
        err, idx = _palette_err_u(
            h_pts, mask, _unquantize_dyn(q0, prec_arr, signed, precs),
            _unquantize_dyn(q1, prec_arr, signed, precs), signed,
            index_bits)
    return err, q0, q1, idx


def _shake_best(h_pts, best, modes, signed, rounds, regions, ptab_j):
    """Shake the race winner's endpoints (per-block mode => dynamic prec),
    then re-swap anchors and re-gate; blocks whose shaken result overflows
    the winner mode's deltas (or doesn't improve) keep the unshaken one.
    """
    best_err, mode, shape, qs, idx = best
    precs = tuple(sorted({m.base_bits for _, m in modes}))
    prec_arr = jnp.zeros_like(mode)
    for mi, m in modes:
        prec_arr = jnp.where(mode == mi, m.base_bits, prec_arr)
    if regions == 2:
        sub = ptab_j[shape]
        mask0 = (sub == 0).astype(F32)
        mask1 = (sub == 1).astype(F32)
        err0, q0, q1, idx0 = _shake_q(h_pts, mask0, qs[:, 0], qs[:, 1],
                                      prec_arr, signed, 3, idx, rounds,
                                      precs)
        err1, q2, q3, idx1 = _shake_q(h_pts, mask1, qs[:, 2], qs[:, 3],
                                      prec_arr, signed, 3, idx, rounds,
                                      precs)
        err_sh = err0 + err1
        idx_sh = jnp.where(sub == 0, idx0, idx1)
        q_sh = jnp.stack([q0, q1, q2, q3], 1)
        qs_sw, idx_sw, _, _ = _swap_for_anchors(_TWO_ANY, shape, q_sh,
                                                idx_sh)
    else:
        mask = jnp.ones(h_pts.shape[:2], F32)
        err_sh, q0, q1, idx_sh = _shake_q(h_pts, mask, qs[:, 0], qs[:, 1],
                                          prec_arr, signed, 4, idx, rounds,
                                          precs)
        q_sh = jnp.stack([q0, q1, q0, q1], 1)
        qs_sw, idx_sw, _, _ = _swap_for_anchors(
            _ONE_ANY, jnp.zeros_like(shape), q_sh, idx_sh)
    err_g = err_sh
    for mi, m in modes:
        if m.transformed:
            err_g = jnp.where(mode == mi, _gate_mode(m, qs_sw, err_sh),
                              err_g)
    take = err_g < best_err
    return (jnp.where(take, err_g, best_err), mode, shape,
            jnp.where(take[:, None, None], qs_sw, qs),
            jnp.where(take[:, None], idx_sw, idx))


def _gate_mode(m, qs, err):
    """Delta-fit gate for one mode on anchor-swapped endpoints."""
    if not m.transformed:
        return err
    ok = None
    js = (1, 2, 3) if m.regions == 2 else (1,)
    for j in js:
        d = qs[:, j] - qs[:, 0]
        for c in range(3):
            o = _delta_ok(d[:, c], m.delta_bits[c])
            ok = o if ok is None else ok & o
    return jnp.where(ok, err, jnp.inf)


def _eval_prec_two(h_pts, prec, shape, sub, e, signed):
    """Quantize + palette-evaluate one 2-region precision for a shape.

    The decode palette depends only on (prec, signed) — never on which
    mode carries it — so every mode sharing a precision shares this
    evaluation. e = (e0s0, e1s0, e0s1, e1s1) work-domain floats.
    Returns (err, qs (N,4,3) anchor-swapped, idx (N,16) swapped).
    """
    q = [_quantize(x, prec, signed) for x in e]            # 4 x (N,3)
    mask0 = (sub == 0).astype(F32)
    mask1 = (sub == 1).astype(F32)
    err0, idx0 = _palette_err(h_pts, mask0, q[0], q[1], prec, signed, 3)
    err1, idx1 = _palette_err(h_pts, mask1, q[2], q[3], prec, signed, 3)
    err = err0 + err1
    idx = jnp.where(sub == 0, idx0, idx1)
    # anchor swap BEFORE the delta-fit gate: swapping negates deltas, and
    # the two's-complement range is asymmetric (reference order:
    # SwapIndices -> TransformEndPoints -> endpts_fit, bc6h:1393-1440)
    qs, idx, _, _ = _swap_for_anchors(_TWO_ANY, shape, jnp.stack(q, 1), idx)
    return err, qs, idx


def _eval_prec_one(h_pts, prec, e0, e1, signed):
    n = h_pts.shape[0]
    q0 = _quantize(e0, prec, signed)
    q1 = _quantize(e1, prec, signed)
    mask = jnp.ones((n, 16), F32)
    err, idx = _palette_err(h_pts, mask, q0, q1, prec, signed, 4)
    qs, idx, _, _ = _swap_for_anchors(
        _ONE_ANY, jnp.zeros((n,), I32), jnp.stack([q0, q1, q0, q1], 1), idx)
    return err, qs, idx


def _pack(mode_sel, shape, q, idx, signed):
    """Pack chosen per-block (mode, shape, endpoints, indices).

    mode_sel (N,) index into BC6H_MODES; q (N,4,3); idx (N,16).
    Builds every mode's block and selects — uniform and branch-free.
    """
    n = mode_sel.shape[0]
    out = bitpack.zeros(n, 4)
    for mi, m in enumerate(BC6H_MODES):
        words = _pack_mode(m, shape, q, idx, signed)
        out = jnp.where((mode_sel == mi)[:, None], words, out)
    return out


def _swap_for_anchors(m, shape, q, idx):
    """Ensure anchor indices have MSB 0 (SwapIndices analog, bc6h:555-596):
    swap the subset's endpoints and complement its indices."""
    n = shape.shape[0]
    if m.regions == 2:
        ptab = jnp.asarray(partition_table(2)[:32])
        sub = ptab[shape]
        anchor1 = jnp.asarray(ANCHOR2, I32)[shape]
        ibits = 3
    else:
        sub = jnp.zeros((n, 16), I32)
        anchor1 = None
        ibits = 4
    comp = (1 << ibits) - 1
    msb = 1 << (ibits - 1)
    # subset 0 anchor = pixel 0
    need0 = (idx[:, 0] & msb) != 0
    idx = jnp.where(need0[:, None] & (sub == 0), comp - idx, idx)
    sw = need0[:, None, None]
    q = q.at[:, 0].set(jnp.where(sw[:, 0], q[:, 1], q[:, 0])).at[:, 1].set(
        jnp.where(sw[:, 0], q[:, 0], q[:, 1]))
    if m.regions == 2:
        a1 = jnp.take_along_axis(idx, anchor1[:, None], axis=1)[:, 0]
        need1 = (a1 & msb) != 0
        idx = jnp.where(need1[:, None] & (sub == 1), comp - idx, idx)
        sw1 = need1[:, None]
        q2, q3 = q[:, 2], q[:, 3]
        q = q.at[:, 2].set(jnp.where(sw1, q3, q2)).at[:, 3].set(
            jnp.where(sw1, q2, q3))
    return q, idx, sub, anchor1


def _pack_mode(m, shape, q, idx, signed):
    """Pack one mode; ``q``/``idx`` are already anchor-swapped by the eval
    stage (swap must precede the delta-fit gate)."""
    n = shape.shape[0]
    anchor1 = jnp.asarray(ANCHOR2, I32)[shape] if m.regions == 2 else None
    prec = m.base_bits
    pmask = (1 << prec) - 1
    fields = {}
    for i, ch in enumerate(("r", "g", "b")):
        fields[ch + "w"] = q[:, 0, i] & pmask
        dmask = (1 << m.delta_bits[i]) - 1
        for j, suff in ((1, "x"), (2, "y"), (3, "z")):
            if m.transformed:
                fields[ch + suff] = (q[:, j, i] - q[:, 0, i]) & dmask
            else:
                fields[ch + suff] = q[:, j, i] & dmask
    sink = bitpack.Sink(n, 4)
    sink.put(jnp.full((n,), m.code, I32), 0, m.code_bits)
    for field, src, dst, nbits in LAYOUTS[m.mode]:
        piece = (fields[field] >> src) & ((1 << nbits) - 1)
        sink.put(piece, dst, nbits)
    if m.regions == 2:
        sink.put(shape, TWO_REGION_SHAPE_BIT, 5)
        # the subset-1 anchor of the 32 shapes is always 2, 8 or 15
        # (g_indexfixups, amd_bc6h_body.hpp:210-220): pack with three
        # STATIC layouts and select — no dynamic-offset insertion
        for a in _ANCHOR_CLASSES:
            cls = bitpack.Sink(n, 4)
            pos = TWO_REGION_INDEX_BIT
            for i in range(16):
                wbits = 2 if i in (0, a) else 3
                cls.put(idx[:, i], pos, wbits)
                pos += wbits
            match = anchor1 == a
            for w in range(4):
                sink.cols[w] = jnp.where(match, sink.cols[w] | cls.cols[w],
                                         sink.cols[w])
    else:
        pos = ONE_REGION_INDEX_BIT
        sink.put(idx[:, 0], pos, 3)
        pos += 3
        for i in range(1, 16):
            sink.put(idx[:, i], pos, 4)
            pos += 4
    return sink.words()


def _budgets(quality: float):
    """quality -> (topk shapes, fit iters, shake rounds); shake plays
    ep_shaker_HD's role (USE_SHAKERHD gate is quality > 0.8 in the
    reference, amd_bc6h_body.cpp:960-1026, active at its hardwired 1.0)."""
    if quality <= 0.3:
        return 2, 1, 0
    if quality <= 0.7:
        return 3, 2, 0
    if quality <= 0.8:
        return 4, 2, 0
    return 4, 2, 1


@partial(jax.jit, static_argnames=("signed", "mode_mask", "quality"))
def encode_bc6h_blocks(blocks: jnp.ndarray, *, signed: bool = False,
                       mode_mask: int = 0xFFFF, quality: float = 1.0):
    """Encode (N,16,3) float32 HDR blocks -> ((N,4) uint32, (N,) err).

    ``mode_mask``: bit (m-1) enables AMD-numbered mode m (1..14).
    err is the squared error in half-int space (the decode-exact metric).
    """
    n = blocks.shape[0]
    h_pts = f32_to_half_int(blocks, signed)                # (N,16,3)
    u_pts = _to_work(h_pts, signed)
    topk, iters, shake = _budgets(quality)

    # ---- shape ranking: one vectorized bounds-axis estimate over all 32
    # shapes (BC6H shapes ARE the first 32 2-subset BC7 partitions), then
    # exact PCA+LSQ fits only for the top-K shapes ----
    from .bc7_full import _estimate_partitions_vec
    ptab = partition_table(2)[:32]
    est = _estimate_partitions_vec(u_pts, 2, tuple(range(32)), 8)  # (N,32)
    _, top_shapes = jax.lax.top_k(-est, topk)              # (N,K)
    ptab_all = jnp.asarray(ptab)
    fits_k = []
    ones3 = jnp.asarray((1.0, 1.0, 1.0), F32)
    for k in range(topk):
        sub_k = ptab_all[top_shapes[:, k]]                 # (N,16)
        m0 = (sub_k == 0).astype(F32)
        m1 = (sub_k == 1).astype(F32)
        e00, e01 = fit_line_iterative(u_pts, m0, LEVELS3, iters, ones3)
        e10, e11 = fit_line_iterative(u_pts, m1, LEVELS3, iters, ones3)
        fits_k.append((e00, e01, e10, e11))

    # ---- 1-region fit ----
    ones = jnp.ones((n, 16), F32)
    e0_1r, e1_1r = fit_line_iterative(
        u_pts, ones, LEVELS4, iters, jnp.asarray((1.0, 1.0, 1.0), F32))

    ptab_j = jnp.asarray(ptab)
    two_modes = [(mi, m) for mi, m in enumerate(BC6H_MODES)
                 if m.regions == 2 and (mode_mask >> (m.mode - 1)) & 1]
    one_modes = [(mi, m) for mi, m in enumerate(BC6H_MODES)
                 if m.regions == 1 and (mode_mask >> (m.mode - 1)) & 1]
    groups2: dict = {}
    for mi, m in two_modes:
        groups2.setdefault(m.base_bits, []).append((mi, m))
    groups1: dict = {}
    for mi, m in one_modes:
        groups1.setdefault(m.base_bits, []).append((mi, m))

    def merge(best, cand):
        if best is None:
            return cand
        better = cand[0] < best[0]
        return (jnp.minimum(cand[0], best[0]),
                jnp.where(better, cand[1], best[1]),
                jnp.where(better, cand[2], best[2]),
                jnp.where(better[:, None, None], cand[3], best[3]),
                jnp.where(better[:, None], cand[4], best[4]))

    # ---- 2-region race, grouped by precision: the decode palette depends
    # only on (prec, signed), so each precision is quantized and evaluated
    # once per shape and every mode sharing it just applies its delta gate
    best2 = None
    for k in range(topk):
        shape = top_shapes[:, k]
        sub = ptab_j[shape]
        e = list(fits_k[k])
        for prec, group in groups2.items():
            err, qs, idx = _eval_prec_two(h_pts, prec, shape, sub, e, signed)
            for mi, m in group:
                err_m = _gate_mode(m, qs, err)
                best2 = merge(best2, (err_m, jnp.full((n,), mi, I32),
                                      shape, qs, idx))
    # ---- 1-region race
    best1 = None
    zero = jnp.zeros((n,), I32)
    for prec, group in groups1.items():
        err, qs, idx = _eval_prec_one(h_pts, prec, e0_1r, e1_1r, signed)
        for mi, m in group:
            err_m = _gate_mode(m, qs, err)
            best1 = merge(best1, (err_m, jnp.full((n,), mi, I32), zero,
                                  qs, idx))

    # ---- winner-only shake (the reference shakes only its sorted-best
    # pattern): per-block precision comes from the winning mode
    if shake and best2 is not None:
        best2 = _shake_best(h_pts, best2, two_modes, signed, shake,
                            regions=2, ptab_j=ptab_j)
    if shake and best1 is not None:
        best1 = _shake_best(h_pts, best1, one_modes, signed, shake,
                            regions=1, ptab_j=ptab_j)

    cands = [b for b in (best2, best1) if b is not None]

    # ---- graceful no-fit fallback: when every enabled mode is transformed
    # a high-dynamic block can overflow every delta field and gate the whole
    # race to inf — the argmin would then pack truncated garbage. The
    # reference degrades to a canned solid-red block (amd_bc6h_body.cpp:118,
    # 1639-1645); here the fallback is a SOLID MEAN block on the first
    # enabled mode: all four endpoints equal makes every delta zero, which
    # fits any transformed mode, and its true decode error joins the race
    # (so it only ever wins when everything else overflowed).
    all_modes = two_modes + one_modes
    if all_modes and all(m.transformed for _, m in all_modes):
        mi_fb, m_fb = (one_modes if one_modes else two_modes)[0]
        u_mean = jnp.sum(u_pts, axis=1) / 16.0             # (N,3)
        q_m = _quantize(u_mean, m_fb.base_bits, signed)
        qs_fb = jnp.stack([q_m] * 4, 1)
        ones_m = jnp.ones((n, 16), F32)
        ibits_fb = 4 if m_fb.regions == 1 else 3
        err_fb, idx_fb = _palette_err(h_pts, ones_m, q_m, q_m,
                                      m_fb.base_bits, signed, ibits_fb)
        cands.append((err_fb, jnp.full((n,), mi_fb, I32),
                      jnp.zeros((n,), I32), qs_fb, idx_fb))

    best = cands[0]
    for c in cands[1:]:
        best = merge(best, c)
    best_err, best_mode, best_shape, best_q, best_idx = best
    words = _pack(best_mode, best_shape, best_q, best_idx, signed)
    return words, best_err


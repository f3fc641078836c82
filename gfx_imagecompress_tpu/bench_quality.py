"""Quality benchmark: framework PSNR vs the reference algorithm's PSNR.

Implements SURVEY.md §7 step 8 / BASELINE's "establish the reference
numbers": for each codec x quality level, encode the deterministic
natural-image corpus (refcpu/corpus.py) with

  (a) the TPU framework's encoders (XLA reference implementations — the
      same search the Pallas kernels implement, parity-tested elsewhere), and
  (b) the reference-faithful CPU comparators (refcpu/*),

decode both with the independent native C++ oracle and report RGB PSNR
side by side.  The north-star gate is framework >= reference per row.

The reference side is expensive (up to ~1.5 s/block for BC7 max quality) so
results are cached in refcpu/baseline_cache.json keyed by a config hash;
pass --refresh to recompute.  Run:

    python -m gfx_imagecompress_tpu.bench_quality [--fast] [--refresh]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing
import os
import sys

import numpy as np

_CACHE_PATH = os.path.join(os.path.dirname(__file__), "refcpu",
                           "baseline_cache.json")
_CACHE_VERSION = 2    # bump when any refcpu algorithm changes


def _blocks_from_images(imgs, channels=4):
    out = []
    for img in imgs:
        h, w = img.shape[:2]
        c = img.shape[2]
        if c < channels:
            pad = np.ones((h, w, channels - c), np.float32)
            img = np.concatenate([img, pad], -1)
        b = img[..., :channels].reshape(h // 4, 4, w // 4, 4, channels)
        out.append(b.transpose(0, 2, 1, 3, 4).reshape(-1, 16, channels))
    return np.concatenate(out)


def corpus_blocks(n=4, size=64, kind="opaque"):
    from .refcpu import corpus
    if kind == "hdr":
        return _blocks_from_images(corpus.corpus_hdr(n, size, size), 3)
    return _blocks_from_images(corpus.corpus_rgba(n, size, size, kind))


def _psnr_rgb_u8(dec, src255, channels=3):
    mse = ((dec[..., :channels].astype(np.float64)
            - src255[..., :channels]) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _psnr_half(dec_half_bits, src, peak):
    dec = dec_half_bits.astype(np.uint16).view(np.float16).astype(np.float64)
    mse = ((dec - src.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(peak ** 2 / max(mse, 1e-12))


# ---- reference-side encoders (run in worker processes) ------------------

def _ref_chunk(args):
    codec, opts, chunk = args
    from .refcpu import bc6h_amd, bc7_amd, bc7enc16, bcx_amd
    if codec == "bc1":
        return bcx_amd.encode_bc1_blocks(chunk, **opts)
    if codec == "bc2":
        return bcx_amd.encode_bc2_blocks(chunk, **opts)
    if codec == "bc3":
        return bcx_amd.encode_bc3_blocks(chunk, **opts)
    if codec == "bc4":
        return bcx_amd.encode_bc4_blocks(chunk[:, :, 0])
    if codec == "bc7_fast":
        return bc7enc16.encode_blocks(chunk, **opts)
    if codec == "bc7_full":
        return bc7_amd.encode_blocks(chunk, **opts)
    if codec == "bc6h":
        return bc6h_amd.encode_blocks(chunk[..., :3], **opts)
    raise ValueError(codec)


def ref_encode(codec, opts, blocks, procs=None):
    procs = procs or max(1, (os.cpu_count() or 1))
    chunks = np.array_split(blocks, procs * 4)
    args = [(codec, opts, c) for c in chunks if len(c)]
    if procs == 1:
        outs = [_ref_chunk(a) for a in args]
    else:
        # spawn, not fork: the package __init__ imports jax (multithreaded)
        # before the first pool is created, and fork would deadlock.
        ctx = multiprocessing.get_context("spawn")
        with ctx.Pool(procs) as pool:
            outs = pool.map(_ref_chunk, args)
    return np.concatenate(outs)


# ---- framework-side encoders --------------------------------------------

def fw_encode(codec, opts, blocks, pallas=False):
    """Framework-side encode. ``pallas=True`` dispatches the fused Pallas
    kernels — the exact path api.py ships (VERDICT r2 item 2: the quality
    matrix must certify the shipping kernels, not just their XLA mirrors).
    Off-TPU the Pallas kernels run in interpret mode automatically."""
    import jax.numpy as jnp
    b = jnp.asarray(blocks)
    if codec == "bc1":
        if pallas:
            from .kernels.bc1_pallas import encode_bc1_blocks_pallas
            from .options import PERCEPTUAL_WEIGHTS
            kw = dict(opts)
            kw.setdefault("weights", PERCEPTUAL_WEIGHTS)
            w, _ = encode_bc1_blocks_pallas(b, **kw)
        else:
            from .kernels.bc1 import encode_bc1_blocks
            w, _ = encode_bc1_blocks(b, **opts)
    elif codec == "bc4":
        if pallas:
            from .kernels.bc4_pallas import encode_bc4_blocks_pallas
            w, _ = encode_bc4_blocks_pallas(b[:, :, 0])
        else:
            from .kernels.bc4 import encode_bc4_blocks
            w, _ = encode_bc4_blocks(b[:, :, 0])
    elif codec in ("bc2", "bc3"):
        if pallas:
            # the api.py route: fused single-launch BC2/BC3 kernels
            from .kernels.bc1_pallas import (encode_bc2_blocks_pallas,
                                             encode_bc3_blocks_pallas)
            enc = (encode_bc2_blocks_pallas if codec == "bc2"
                   else encode_bc3_blocks_pallas)
            w, _ = enc(b)
        else:
            from .kernels.bc1 import encode_bc1_blocks
            from .kernels.bc4 import (encode_bc2_alpha_blocks,
                                      encode_bc4_blocks)
            cw, _ = encode_bc1_blocks(b, force_four_decode=True,
                                      allow_three=False)
            if codec == "bc2":
                aw, _ = encode_bc2_alpha_blocks(b[:, :, 3])
            else:
                aw, _ = encode_bc4_blocks(b[:, :, 3])
            w = jnp.concatenate([aw, cw], axis=1)
    elif codec == "bc7_fast":
        if pallas:
            from .kernels.bc7_fast_pallas import (
                encode_bc7_fast_blocks_pallas)
            w, _ = encode_bc7_fast_blocks_pallas(b, **opts)
        else:
            from .kernels.bc7_fast import encode_bc7_fast_blocks
            w, _ = encode_bc7_fast_blocks(b, **opts)
    elif codec == "bc7_full":
        if pallas:
            from .kernels.bc7_full_pallas import encode_bc7_blocks_pallas
            w, _ = encode_bc7_blocks_pallas(b, **opts)
        else:
            from .kernels.bc7_full import encode_bc7_blocks
            w, _ = encode_bc7_blocks(b, **opts)
    elif codec == "bc6h":
        if pallas:
            from .kernels.bc6h_pallas import encode_bc6h_blocks_pallas
            w, _ = encode_bc6h_blocks_pallas(b[..., :3], **opts)
        else:
            from .kernels.bc6h import encode_bc6h_blocks
            w, _ = encode_bc6h_blocks(b[..., :3], **opts)
    else:
        raise ValueError(codec)
    return np.asarray(w)


# ---- configuration matrix ----------------------------------------------

def config_matrix(fast=False):
    """Rows: (name, codec, corpus_kind, ref_opts, fw_opts, decode)."""
    # heavy rows ride 4k blocks (16 images): 1k was within shot-noise of
    # corpus choice for a 0.03 dB delta (VERDICT r2 weak 7)
    n, size = (2, 32) if fast else (16, 64)
    nb, sb = (4, 64) if fast else (8, 128)      # big corpus for cheap codecs
    rows = [
        ("bc1", "bc1", (nb, sb, "opaque"), {}, {}, "bc1"),
        ("bc1_punch", "bc1", (nb, sb, "punch"),
         dict(use_alpha=True, alpha_threshold01=128 / 255.0),
         dict(use_alpha=True, alpha_threshold=128 / 255.0), "bc1"),
        ("bc4", "bc4", (nb, sb, "opaque"), {}, {}, "bc4"),
        ("bc2", "bc2", (nb, sb, "gradient"), {}, {}, "bc2"),
        ("bc3", "bc3", (nb, sb, "gradient"), {}, {}, "bc3"),
        ("bc7_fast", "bc7_fast", (nb, sb, "opaque"),
         dict(fast=False, perceptual=False),
         dict(fast=False, perceptual=False), "bc7"),
        ("bc7_fastest", "bc7_fast", (nb, sb, "opaque"),
         dict(fast=True, perceptual=False),
         dict(fast=True, perceptual=False), "bc7"),
        ("bc7_full_q1", "bc7_full", (n, size, "opaque"),
         dict(quality=1.0), dict(quality=1.0), "bc7"),
        ("bc7_full_q0.6", "bc7_full", (n, size, "opaque"),
         dict(quality=0.6), dict(quality=0.6), "bc7"),
        ("bc7_full_q0.3", "bc7_full", (n, size, "opaque"),
         dict(quality=0.3), dict(quality=0.3), "bc7"),
        ("bc7_full_alpha", "bc7_full", (n, size, "gradient"),
         dict(quality=1.0), dict(quality=1.0), "bc7"),
        # the performance<1 block-API regime (VERDICT r4 item 7): at
        # perf=0.3 the reference's quantizer gate (blockMaxRange >
        # 255*perf, amd_bc7_body.cpp:606-630) routes ~half of this small
        # corpus through the TRACE quantizer (refcpu _opt_quant_trace —
        # exact optimal monotone clustering); perf=0.5's threshold of
        # 127.5 is above all but ~3% of corpus block ranges and would
        # measure nothing. Small corpus: the trace oracle is ~15 s/block.
        ("bc7_full_p0.3", "bc7_full", (2, 32, "opaque"),
         dict(quality=0.3, performance=0.3),
         dict(quality=0.3, performance=0.3), "bc7"),
        ("bc6h_uf", "bc6h", (n, size, "hdr"),
         dict(signed=False), dict(signed=False), "bc6h_uf"),
        ("bc6h_sf", "bc6h", (n, size, "hdr"),
         dict(signed=True), dict(signed=True), "bc6h_sf"),
    ]
    return rows


def _decode_psnr(kind, words, blocks):
    from . import native
    if kind == "bc1":
        dec = native.decode_bc1(words)
        return _psnr_rgb_u8(dec, np.rint(blocks[..., :3] * 255.0))
    if kind == "bc4":
        dec = native.decode_bc4(words)
        return _psnr_rgb_u8(dec[..., None],
                            np.rint(blocks[..., :1] * 255.0), 1)
    if kind in ("bc2", "bc3"):
        dec = (native.decode_bc2 if kind == "bc2"
               else native.decode_bc3)(np.ascontiguousarray(words))
        return _psnr_rgb_u8(dec, np.rint(blocks[..., :4] * 255.0), 4)
    if kind == "bc7":
        dec = native.decode_bc7(words)
        return _psnr_rgb_u8(dec, np.rint(blocks[..., :3] * 255.0))
    if kind in ("bc6h_uf", "bc6h_sf"):
        dech = native.decode_bc6h(words, signed=kind.endswith("sf"))
        peak = float(blocks[..., :3].max() - min(blocks[..., :3].min(), 0))
        return _psnr_half(dech, blocks[..., :3], peak)
    raise ValueError(kind)


def _cfg_key(name, corpus_cfg, opts):
    h = hashlib.sha256(json.dumps(
        [_CACHE_VERSION, name, list(corpus_cfg), sorted(opts.items())],
        default=str).encode()).hexdigest()[:16]
    return f"{name}:{h}"


def run(fast=False, refresh=False, only=None, procs=None, pallas=False,
        ref_only=False):
    cache = {}
    if os.path.exists(_CACHE_PATH):
        with open(_CACHE_PATH) as f:
            cache = json.load(f)
    results = []
    dirty = False
    for name, codec, corpus_cfg, ref_opts, fw_opts, dec_kind in \
            config_matrix(fast):
        if only and name not in only:
            continue
        blocks = corpus_blocks(*corpus_cfg)
        key = _cfg_key(name, corpus_cfg, ref_opts)
        if key in cache and not refresh:
            ref_psnr = cache[key]
        else:
            w_ref = ref_encode(codec, ref_opts, blocks, procs)
            ref_psnr = float(_decode_psnr(dec_kind, w_ref, blocks))
            cache[key] = ref_psnr
            dirty = True
        if ref_only:
            print(f"{name:16s} ref {ref_psnr:7.3f}  (ref-only)",
                  file=sys.stderr)
            continue
        w_fw = fw_encode(codec, fw_opts, blocks, pallas=pallas)
        fw_psnr = float(_decode_psnr(dec_kind, w_fw, blocks))
        delta = fw_psnr - ref_psnr
        results.append(dict(config=name, blocks=int(len(blocks)),
                            path="pallas" if pallas else "xla",
                            ref_psnr=round(ref_psnr, 3),
                            fw_psnr=round(fw_psnr, 3),
                            delta_db=round(delta, 3),
                            ok=bool(delta >= -0.05)))
        print(f"{name:16s} ref {ref_psnr:7.3f}  fw {fw_psnr:7.3f}  "
              f"delta {delta:+.3f} dB  {'OK' if delta >= -0.05 else 'BEHIND'}",
              file=sys.stderr)
    if dirty:
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    if not only and not ref_only:
        # partial (--only) runs must not clobber the full-matrix artifact;
        # the Pallas (shipping-path) matrix goes to its own artifact
        out = ("quality_results_pallas.json" if pallas
               else "quality_results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    worst = min((r["delta_db"] for r in results), default=0.0)
    print(json.dumps({"metric": "quality_vs_reference_worst_delta",
                      "value": round(worst, 3), "unit": "dB",
                      "vs_baseline": round(worst, 3)}))
    return results


def main():
    # persistent compile cache (same store bench.py/tests use): the
    # max-quality BC7 graphs compile for minutes cold
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--refresh", action="store_true")
    ap.add_argument("--only", nargs="*")
    ap.add_argument("--procs", type=int)
    ap.add_argument("--pallas", action="store_true",
                    help="gate the fused Pallas kernels (the api.py path)")
    ap.add_argument("--ref-only", action="store_true",
                    help="only (re)compute + cache the reference side")
    a = ap.parse_args()
    run(fast=a.fast, refresh=a.refresh, only=a.only, procs=a.procs,
        pallas=a.pallas, ref_only=a.ref_only)


if __name__ == "__main__":
    main()

"""Benchmark harness — BASELINE.json configs on the available backend.

Prints ONE JSON line: the headline metric (BC1 encode throughput per chip,
Mtexel/s; vs_baseline is the ratio against the 1 Gtexel/s north-star
target). Full per-config results are written to bench_results.json.

Methodology: the dev tunnel to the TPU adds ~30 ms of fixed round-trip
latency per fetch and block_until_ready returns at enqueue, so wall-clock
loops are meaningless. Instead each encoder is wrapped in an on-device
``lax.fori_loop`` (input perturbed per iteration to defeat hoisting, result
folded into a checksum) and timed at two trip counts; the *marginal* time
per iteration is pure device compute — the number that matters for batched
production serving.
"""
import json
import os
import sys
import time

import numpy as np

# ---- roofline model (VERDICT r4 item 4) --------------------------------
# These encoders are candidate searches in fp32/int32 on the VPU — there
# are no matmuls, so the MXU bf16 peak (public v5e: 197 TFLOP/s) is not
# the ceiling. VPU model: (8,128) vector registers x 4 ALUs x 2 flops/FMA
# x ~1.5 GHz (the clock implied by 197e12 / (2 MXUs * 128*128 MACs * 2))
# ~= 12.3 TFLOP/s fp32. Treat utilization as a MODEL with ~2x systematic
# uncertainty: compare/select/min ops issue as 1 op (not an FMA), and the
# flop side comes from XLA cost analysis of the jnp twins (see PERF.md).
# HBM: 819 GB/s (public v5e figure).
VPU_PEAK_FLOPS = 1024 * 4 * 2 * 1.5e9
HBM_PEAK_BYTES = 819e9

_FLOPS_MODEL_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "flops_model.json")


def _load_flops_model():
    try:
        with open(_FLOPS_MODEL_PATH) as f:
            return json.load(f)
    except OSError:
        return {}


def _mfu_fields(results, key, model_key, texels_per_s, model):
    """Attach modeled VPU utilization + HBM fraction for one config."""
    m = model.get(model_key)
    if not m:
        return
    blocks_per_s = texels_per_s / 16.0
    flops_s = blocks_per_s * m["flops_per_block"]
    bytes_s = blocks_per_s * m["bytes_per_block"]
    results[key + "_vpu_util"] = flops_s / VPU_PEAK_FLOPS
    results[key + "_hbm_frac"] = bytes_s / HBM_PEAK_BYTES


def _emit(results, bc1_mts):
    with open("bench_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({
        "metric": "bc1_encode_throughput",
        "value": round(bc1_mts, 1),
        "unit": "Mtexels/s/chip",
        "vs_baseline": round(bc1_mts / 1000.0, 4),
    }))
    for k, v in results.items():
        print(f"  {k}: {v}", file=sys.stderr)


def _marginal_time(encode, blocks, n_lo=1, n_hi=5, reps=3):
    """Marginal per-iteration device time of ``encode(blocks)``."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(b, n):
        def body(i, acc):
            w, _ = encode(b + (i % 2).astype(b.dtype) * 1e-7)
            # Reduce the FULL output so XLA cannot dead-code-eliminate any
            # part of the encoder (slice-of-concatenate previously let the
            # whole colour kernel vanish from BC2/BC3 timings).
            return acc + jnp.sum(w.ravel().astype(jnp.uint32))
        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    _ = np.asarray(run(blocks, 1))  # compile + warm

    def measure(lo, hi):
        times = {}
        for n in (lo, hi):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(run(blocks, n))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[hi] - times[lo]) / (hi - lo)

    dt = measure(n_lo, n_hi)
    if dt < 1e-3:  # below tunnel noise: re-measure with many more trips
        dt = measure(10, 110)
    return max(dt, 1e-9)


def main():
    import os
    import jax
    import jax.numpy as jnp

    # Persistent compile cache (same store the test suite uses): the
    # BC7-full max-quality graph alone compiles for ~5 min cold, which
    # would eat most of the driver's bench budget every round.
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    deadline = time.monotonic() + float(os.environ.get("BENCH_BUDGET_S", 460))

    def time_left():
        return deadline - time.monotonic()

    from gfx_imagecompress_tpu.kernels.bc1_pallas import (
        encode_bc1_blocks_pallas)
    from gfx_imagecompress_tpu.kernels.bc4 import encode_bc2_alpha_blocks
    from gfx_imagecompress_tpu.kernels.bc4_pallas import (
        encode_bc4_blocks_pallas)
    from gfx_imagecompress_tpu.kernels.bc7_fast_pallas import (
        encode_bc7_fast_blocks_pallas)
    from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0])}
    fmodel = _load_flops_model()

    def photo(h, w, c=4):
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([np.sin(x * 0.05) * 0.4 + 0.5,
                        np.cos(y * 0.04) * 0.4 + 0.5,
                        np.sin((x + y) * 0.03) * 0.3 + 0.5,
                        np.ones_like(x)], -1)[..., :c]
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        return np.clip(img, 0, 1).astype(np.float32)

    # --- config 1: BC1, 256x256 content (batched x64 = 262144 blocks) ---
    imgs = jnp.asarray(np.stack([photo(256, 256)] * 64))
    blocks = image_to_blocks(imgs)
    dt = _marginal_time(encode_bc1_blocks_pallas, blocks)
    texels = 64 * 256 * 256
    bc1_mts = texels / dt / 1e6
    results["bc1_256_mtexels_per_s"] = bc1_mts
    _mfu_fields(results, "bc1_256_mtexels_per_s", "bc1", bc1_mts * 1e6,
                fmodel)

    # --- config 2: BC4/BC5 512x512 gray/normal maps ---
    if time_left() < 60:
        results["skipped_after"] = "bc1"
        return _emit(results, bc1_mts)
    g2 = image_to_blocks(jnp.asarray(photo(512, 512, 4)[None]))
    g = g2[:, :, 0]
    dt = _marginal_time(encode_bc4_blocks_pallas, g)
    results["bc4_512_mtexels_per_s"] = 512 * 512 / dt / 1e6
    _mfu_fields(results, "bc4_512_mtexels_per_s", "bc4", 512 * 512 / dt,
                fmodel)

    from gfx_imagecompress_tpu.kernels.bc4_pallas import (
        encode_bc5_blocks_pallas)
    dt = _marginal_time(encode_bc5_blocks_pallas, g2)
    results["bc5_512_mtexels_per_s"] = 512 * 512 / dt / 1e6
    _mfu_fields(results, "bc5_512_mtexels_per_s", "bc5", 512 * 512 / dt,
                fmodel)

    # --- config 3: BC2/BC3 1K RGBA (fused single-launch kernels) ---
    if time_left() < 90:
        results["skipped_after"] = "bc4"
        return _emit(results, bc1_mts)
    b1k = image_to_blocks(jnp.asarray(photo(1024, 1024)[None]))
    from gfx_imagecompress_tpu.kernels.bc1_pallas import (
        encode_bc2_blocks_pallas, encode_bc3_blocks_pallas)

    bc3 = encode_bc3_blocks_pallas
    bc2 = encode_bc2_blocks_pallas

    dt = _marginal_time(bc3, b1k)
    results["bc3_1k_mtexels_per_s"] = 1024 * 1024 / dt / 1e6
    _mfu_fields(results, "bc3_1k_mtexels_per_s", "bc3", 1024 * 1024 / dt,
                fmodel)
    dt = _marginal_time(bc2, b1k)
    results["bc2_1k_mtexels_per_s"] = 1024 * 1024 / dt / 1e6
    _mfu_fields(results, "bc2_1k_mtexels_per_s", "bc2", 1024 * 1024 / dt,
                fmodel)

    # --- config 4: BC6H 1K RGBA16F (signed + unsigned) ---
    try:
        if time_left() < 150:
            raise TimeoutError("budget: skipping bc6h")
        from functools import partial

        from gfx_imagecompress_tpu.kernels.bc6h_pallas import (
            encode_bc6h_blocks_pallas)
        hdr = np.exp(photo(1024, 1024, 3).astype(np.float32) * 4.0)
        bh = image_to_blocks(jnp.asarray(hdr[None]))
        for signed in (False, True):
            fn = partial(encode_bc6h_blocks_pallas, signed=signed)
            dt = _marginal_time(fn, bh, n_lo=1, n_hi=3)
            key = ("bc6h_1k_%s_mtexels_per_s"
                   % ("snorm" if signed else "ufloat"))
            results[key] = 1024 * 1024 / dt / 1e6
            _mfu_fields(results, key, "bc6h", 1024 * 1024 / dt, fmodel)
    except Exception as e:  # keep the headline alive if BC6H regresses
        results["bc6h_error"] = repr(e)

    # --- config 5: BC7 (fast on 1K; full search at max quality, one slab) ---
    if time_left() < 90:
        results["skipped_after"] = "bc6h"
        return _emit(results, bc1_mts)
    from functools import partial as _p
    dt = _marginal_time(_p(encode_bc7_fast_blocks_pallas, fast=True,
                           perceptual=False), b1k, n_lo=1, n_hi=3)
    results["bc7_fast_1k_mtexels_per_s"] = 1024 * 1024 / dt / 1e6
    _mfu_fields(results, "bc7_fast_1k_mtexels_per_s", "bc7_fast",
                1024 * 1024 / dt, fmodel)
    try:
        if time_left() < 120:
            raise TimeoutError("budget: skipping bc7 full")
        from gfx_imagecompress_tpu.kernels.bc7_full_pallas import (
            encode_bc7_blocks_pallas)
        # BASELINE config 5 as written: 2K image, max-quality full search.
        b2k = image_to_blocks(jnp.asarray(photo(2048, 2048)[None]))
        dt = _marginal_time(encode_bc7_blocks_pallas, b2k, n_lo=1, n_hi=3)
        results["bc7_full_2k_mtexels_per_s"] = 2048 * 2048 / dt / 1e6
        _mfu_fields(results, "bc7_full_2k_mtexels_per_s", "bc7_full",
                    2048 * 2048 / dt, fmodel)
    except Exception as e:
        results["bc7_full_error"] = repr(e)

    return _emit(results, bc1_mts)


if __name__ == "__main__":
    main()

"""Benchmark harness — BASELINE.json configs on the available backend.

Prints ONE JSON line: the headline metric (BC1 encode throughput per chip,
Mtexel/s; vs_baseline is the ratio against the 1 Gtexel/s north-star
target). Full per-config results are written to bench_results.json.

Methodology: each config is encoded once to compile, then timed over
steady-state iterations with block_until_ready fences. Throughput configs
batch enough blocks to saturate the chip (a single 256^2 image is
launch-bound; production serving batches many textures).
"""
import json
import sys
import time

import numpy as np


def _time(fn, iters=10):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from gfx_imagecompress_tpu.kernels.bc1 import (encode_bc1_blocks,
                                                   encode_rgb_blocks)
    from gfx_imagecompress_tpu.kernels.bc4 import (encode_bc2_alpha_blocks,
                                                   encode_bc4_blocks)
    from gfx_imagecompress_tpu.kernels.bc7_fast import encode_bc7_fast_blocks
    from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0])}

    def photo(h, w, c=4):
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([np.sin(x * 0.05) * 0.4 + 0.5,
                        np.cos(y * 0.04) * 0.4 + 0.5,
                        np.sin((x + y) * 0.03) * 0.3 + 0.5,
                        np.ones_like(x)], -1)[..., :c]
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        return np.clip(img, 0, 1).astype(np.float32)

    # --- config 1: BC1, 256x256 (batched x64 for steady state) ---
    imgs = jnp.asarray(np.stack([photo(256, 256)] * 64))
    blocks = image_to_blocks(imgs)
    dt = _time(lambda: encode_bc1_blocks(blocks)[0])
    texels = 64 * 256 * 256
    bc1_mts = texels / dt / 1e6
    results["bc1_256_mtexels_per_s"] = bc1_mts
    # single-image latency too
    one = image_to_blocks(imgs[:1])
    dt1 = _time(lambda: encode_bc1_blocks(one)[0], iters=20)
    results["bc1_256_single_image_ms"] = dt1 * 1e3

    # --- config 2: BC4/BC5 512x512 gray/normal maps ---
    g = image_to_blocks(jnp.asarray(photo(512, 512, 4)[None]))[:, :, 0]
    dt = _time(lambda: encode_bc4_blocks(g)[0])
    results["bc4_512_mtexels_per_s"] = 512 * 512 / dt / 1e6

    # --- config 3: BC2/BC3 1K RGBA ---
    b1k = image_to_blocks(jnp.asarray(photo(1024, 1024)[None]))
    def bc3():
        cw, _ = encode_rgb_blocks(b1k)
        aw, _ = encode_bc4_blocks(b1k[:, :, 3])
        return cw, aw
    dt = _time(bc3, iters=5)
    results["bc3_1k_mtexels_per_s"] = 1024 * 1024 / dt / 1e6
    def bc2():
        cw, _ = encode_rgb_blocks(b1k)
        aw, _ = encode_bc2_alpha_blocks(b1k[:, :, 3])
        return cw, aw
    dt = _time(bc2, iters=5)
    results["bc2_1k_mtexels_per_s"] = 1024 * 1024 / dt / 1e6

    # --- config 4: BC6H 1K RGBA16F (signed + unsigned) ---
    try:
        from gfx_imagecompress_tpu.kernels.bc6h import encode_bc6h_blocks
        from gfx_imagecompress_tpu.pipeline.chunking import encode_chunked
        from functools import partial
        hdr = np.exp(photo(1024, 1024, 3).astype(np.float32) * 4.0)
        bh = image_to_blocks(jnp.asarray(hdr[None]))
        for signed in (False, True):
            fn = partial(encode_bc6h_blocks, signed=signed)
            dt = _time(lambda: encode_chunked(fn, bh, chunk=16384)[0],
                       iters=2)
            key = "bc6h_1k_%s_mtexels_per_s" % ("snorm" if signed else "ufloat")
            results[key] = 1024 * 1024 / dt / 1e6
    except Exception as e:  # keep the headline alive if BC6H regresses
        results["bc6h_error"] = repr(e)

    # --- config 5: BC7 (fast path on 1K; full search on 512 at max quality) ---
    dt = _time(lambda: encode_bc7_fast_blocks(b1k, fast=True,
                                              perceptual=False)[0], iters=3)
    results["bc7_fast_1k_mtexels_per_s"] = 1024 * 1024 / dt / 1e6
    try:
        from gfx_imagecompress_tpu.kernels.bc7_full import encode_bc7_blocks
        from gfx_imagecompress_tpu.pipeline.chunking import encode_chunked
        b512 = image_to_blocks(jnp.asarray(photo(512, 512)[None]))
        dt = _time(lambda: encode_chunked(encode_bc7_blocks, b512)[0],
                   iters=2)
        results["bc7_full_512_mtexels_per_s"] = 512 * 512 / dt / 1e6
    except Exception as e:
        results["bc7_full_error"] = repr(e)

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


if __name__ == "__main__":
    main()

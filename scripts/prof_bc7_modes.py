"""Per-mode on-chip cost attribution for BC7-full at max quality.

Times encode_bc7_blocks_pallas with single-mode masks on an opaque 2K-image
batch (the BASELINE config-5 content: runtime skip keeps modes 6/7 off), so
the remaining budget can be spent where the milliseconds are. Not a test.

Run on the TPU chip:  python scripts/prof_bc7_modes.py [side_px]
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def marginal(fn, blocks, n_lo=1, n_hi=3, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(b, n):
        def body(i, acc):
            w, _ = fn(b + (i % 2).astype(b.dtype) * 1e-7)
            return acc + jnp.sum(w.ravel().astype(jnp.uint32))
        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    _ = np.asarray(run(blocks, 1))
    times = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(run(blocks, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from gfx_imagecompress_tpu.kernels.bc7_full_pallas import (
        encode_bc7_blocks_pallas)
    from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:side, 0:side].astype(np.float32)
    img = np.stack([np.sin(x * 0.05) * 0.4 + 0.5,
                    np.cos(y * 0.04) * 0.4 + 0.5,
                    np.sin((x + y) * 0.03) * 0.3 + 0.5,
                    np.ones_like(x)], -1)
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    img = np.clip(img, 0, 1).astype(np.float32)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    texels = side * side
    print(f"{side}x{side}: {blocks.shape[0]} blocks")

    masks = [("full 0xFF", 0xFF)] + [
        (f"mode{m}", 1 << m) for m in range(8)]
    base = None
    for name, mask in masks:
        fn = partial(encode_bc7_blocks_pallas, mode_mask=mask)
        dt = marginal(fn, blocks)
        mts = texels / dt / 1e6
        note = ""
        if name == "full 0xFF":
            base = dt
        elif base:
            note = f"  ({dt / base * 100:5.1f}% of full)"
        print(f"  {name:10s} {dt * 1e3:8.2f} ms  {mts:8.1f} Mtexel/s{note}")


if __name__ == "__main__":
    main()

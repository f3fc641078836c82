"""Round-3 on-chip profiling: attribute the round-2 regressions.

Times kernel variants with feature knobs to locate cost. Not a test.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def marginal(encode, blocks, n_lo=1, n_hi=5, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(b, n):
        def body(i, acc):
            out = encode(b + (i % 2).astype(b.dtype) * 1e-7)
            w = out[0] if isinstance(out, tuple) else out
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
    import jax.numpy as jnp
    from functools import partial
    from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

    rng = np.random.default_rng(0)

    def photo(h, w, c=4):
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([np.sin(x * 0.05) * 0.4 + 0.5,
                        np.cos(y * 0.04) * 0.4 + 0.5,
                        np.sin((x + y) * 0.03) * 0.3 + 0.5,
                        np.ones_like(x)], -1)[..., :c]
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        return np.clip(img, 0, 1).astype(np.float32)

    b1k = image_to_blocks(jnp.asarray(photo(1024, 1024)[None]))
    texels = 1024 * 1024

    which = sys.argv[1] if len(sys.argv) > 1 else "bc7fast"

    if which == "bc7fast":
        from gfx_imagecompress_tpu.kernels.bc7_fast_pallas import (
            encode_bc7_fast_blocks_pallas as enc)
        for name, kw in [
            ("fast(default knobs)", dict(fast=True, perceptual=False)),
            ("fast,topk=0-ish(plist=(0,))", dict(fast=True, perceptual=False,
                                                 _plist=(0,), _topk=1)),
            ("fast,topk=1", dict(fast=True, perceptual=False, _topk=1)),
        ]:
            dt = marginal(partial(enc, **kw), b1k, n_lo=1, n_hi=3)
            print(f"bc7fast {name}: {texels/dt/1e6:.1f} Mtexel/s")
    elif which == "bc6h":
        from gfx_imagecompress_tpu.kernels.bc6h_pallas import (
            encode_bc6h_blocks_pallas as enc)
        hdr = np.exp(photo(1024, 1024, 3).astype(np.float32) * 4.0)
        bh = image_to_blocks(jnp.asarray(hdr[None]))
        dt = marginal(partial(enc, signed=False), bh, n_lo=1, n_hi=3)
        print(f"bc6h uf default: {texels/dt/1e6:.1f} Mtexel/s")
    elif which == "bc1":
        from gfx_imagecompress_tpu.kernels.bc1_pallas import (
            encode_bc1_blocks_pallas as enc)
        imgs = jnp.asarray(np.stack([photo(256, 256)] * 64))
        blocks = image_to_blocks(imgs)
        dt = marginal(enc, blocks)
        print(f"bc1 default: {64*256*256/dt/1e6:.1f} Mtexel/s")


if __name__ == "__main__":
    main()

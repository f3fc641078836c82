"""Measure BC1 fit-variant PSNR on the quality corpus vs the reference's
30.440 dB (refcpu baseline, quality_results.json bc1 row) to pick how to
spend BC1's throughput headroom on the last -0.014 dB (VERDICT r4 item 2).

CPU run: JAX_PLATFORMS=cpu python scripts/diag_bc1_gap.py [variant ...]
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    import jax.numpy as jnp

    from gfx_imagecompress_tpu import native
    from gfx_imagecompress_tpu.bench_quality import (_psnr_rgb_u8,
                                                     corpus_blocks)
    from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks

    blocks = corpus_blocks(8, 128, "opaque")
    b = jnp.asarray(blocks)
    src = np.rint(blocks[..., :3] * 255.0)

    variants = {
        "base": {},
        "sweep2": dict(_sweep_rounds=2),
        "sweep3": dict(_sweep_rounds=3),
        "passes2": dict(_refine_passes=2),
        "both": dict(_refine_both=True),
        "sweep2_both": dict(_sweep_rounds=2, _refine_both=True),
        "sweep2_passes2": dict(_sweep_rounds=2, _refine_passes=2),
        "all": dict(_sweep_rounds=2, _refine_both=True, _refine_passes=2),
        "each": dict(_refine_each=True),
        "each_sweep2": dict(_refine_each=True, _sweep_rounds=2),
        "each_sweep2_b": dict(_refine_each=True, _sweep_rounds=2,
                              _refine_both=True),
        "tb001": dict(_tb_eps=0.001),
        "tb005": dict(_tb_eps=0.005),
        "tb02": dict(_tb_eps=0.02),
        "tb05": dict(_tb_eps=0.05),
    }
    sel = sys.argv[1:] or list(variants)
    for name in sel:
        kw = variants[name]
        w, _ = encode_bc1_blocks(b, **kw)
        dec = native.decode_bc1(np.ascontiguousarray(np.asarray(w)))
        p = _psnr_rgb_u8(dec, src)
        print(f"bc1 {name:>16}: {p:.4f} dB  (ref 30.440, delta "
              f"{p - 30.440:+.4f})", flush=True)


if __name__ == "__main__":
    main()

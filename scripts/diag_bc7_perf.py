"""Find the fw budget mapping for the performance<1 BC7 regime.

The reference's performance knob swaps its AnD quantizer for the OPTIMAL
trace quantizer on blocks with range > 255*perf (amd_bc7_body.cpp:606-630)
— i.e. lower performance yields BETTER quality (the trace scan is cheap in
C++ because the tables are precomputed). The r5 oracle implements that
path exactly; this diag measures which fw budget boost matches it (the fw
has one quantizer, so parity is bought with search effort instead).

ref PSNR for the row corpus (2,32,opaque) at q0.3/perf0.3: 34.328 dB
(refcpu/baseline_cache.json, bc7_full_p0.3).

JAX_PLATFORMS=cpu python scripts/diag_bc7_perf.py [variant ...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = 34.328


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    import jax.numpy as jnp

    from gfx_imagecompress_tpu import native
    from gfx_imagecompress_tpu.bench_quality import (_psnr_rgb_u8,
                                                     corpus_blocks)
    import gfx_imagecompress_tpu.kernels.bc7_full as B

    blocks = corpus_blocks(2, 32, "opaque")
    b = jnp.asarray(blocks)
    src = np.rint(blocks[..., :3] * 255.0)

    # (nparts, topk, iters, shake, uber) overrides for quality=0.3
    variants = {
        "current": None,                       # topk*perf shrink (ships)
        "noshrink": (32, 2, 2, 1, 1),
        "parts64": (64, 2, 2, 1, 1),
        "parts64_k3": (64, 3, 2, 1, 1),
        "parts64_s2": (64, 2, 2, 2, 1),
        "parts64_k3_u2": (64, 3, 2, 1, 2),
        "q05": (64, 3, 2, 1, 2),
        "parts64_k4_s2_u2": (64, 4, 2, 2, 2),
    }
    sel = sys.argv[1:] or list(variants)
    orig = B._budgets
    for name in sel:
        ov = variants[name]
        if ov is None:
            B._budgets = orig
            kw = dict(quality=0.3, performance=0.3)
        else:
            B._budgets = lambda q, _ov=ov: _ov
            kw = dict(quality=0.3, performance=1.0)
        try:
            jax.clear_caches()
            w, _ = B.encode_bc7_blocks(b, **kw)
            dec = native.decode_bc7(np.ascontiguousarray(np.asarray(w)))
            p = _psnr_rgb_u8(dec, src)
            print(f"bc7 perf0.3 {name:>18}: {p:.4f} dB (delta "
                  f"{p - REF:+.4f})", flush=True)
        finally:
            B._budgets = orig


if __name__ == "__main__":
    main()

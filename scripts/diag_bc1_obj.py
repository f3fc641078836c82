"""Is the BC1 -0.014 dB a search deficit or an objective mismatch?

Both encoders optimize PERCEPTUALLY WEIGHTED error (weights .3086/.6094/
.0820, block_utils.cpp:162-211) while the PSNR yardstick is unweighted.
This diag decodes both sides' words and compares the two sums: if the fw
wins the weighted objective but loses unweighted PSNR, the residue is the
metric, not the search.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/diag_bc1_obj.py
"""
import os
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

W = np.asarray((0.3086, 0.6094, 0.0820))


def _ref_chunk(chunk):
    from gfx_imagecompress_tpu.refcpu import bcx_amd
    return bcx_amd.encode_bc1_blocks(chunk)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    import jax.numpy as jnp

    from gfx_imagecompress_tpu import native
    from gfx_imagecompress_tpu.bench_quality import corpus_blocks
    from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks

    blocks = corpus_blocks(8, 128, "opaque")
    src = np.rint(blocks[..., :3] * 255.0)

    chunks = np.array_split(blocks, 4)
    with Pool(2) as p:
        ref_words = np.concatenate(p.map(_ref_chunk, chunks))
    dec_r = native.decode_bc1(np.ascontiguousarray(ref_words))

    rows = [("ref     ", dec_r)]
    for eps in (0.0, 0.02, 0.05):
        wf, _ = encode_bc1_blocks(jnp.asarray(blocks), _tb_eps=eps)
        rows.append((f"fw e{eps:<4}",
                     native.decode_bc1(np.ascontiguousarray(
                         np.asarray(wf)))))

    for name, dec in rows:
        d = dec[..., :3].astype(np.float64) - src
        sse_u = (d * d).sum()
        sse_w = ((d * d) * W).sum()
        mse = (d * d).mean()
        psnr = 10 * np.log10(255.0 ** 2 / mse)
        print(f"{name}: weighted SSE {sse_w:.0f}  unweighted SSE "
              f"{sse_u:.0f}  PSNR {psnr:.4f}", flush=True)


if __name__ == "__main__":
    main()

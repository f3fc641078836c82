"""Per-mode SSE breakdown of the bc7_full_alpha residue (fw vs refcpu).

Encodes a slice of the gradient corpus both ways at q1, decodes with the
native oracle, and attributes the RGB-SSE delta by (ref mode, fw mode) —
to locate which mode's search is behind.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/diag_alpha_modes.py [nblocks]
"""
import os
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _ref_chunk(chunk):
    from gfx_imagecompress_tpu.refcpu import bc7_amd
    return bc7_amd.encode_blocks(chunk, quality=1.0)


def _mode_of(words):
    m = np.zeros(len(words), np.int64)
    w0 = words[:, 0]
    for mode in range(8):
        mask = (w0 & ((1 << (mode + 1)) - 1)) == (1 << mode)
        m[mask] = mode
    return m


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    import jax.numpy as jnp

    from gfx_imagecompress_tpu import native
    from gfx_imagecompress_tpu.bench_quality import corpus_blocks
    from gfx_imagecompress_tpu.kernels.bc7_full import encode_bc7_blocks

    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    blocks = corpus_blocks(16, 64, "gradient")[:nb]
    src = np.rint(blocks[..., :3] * 255.0)

    wf, _ = encode_bc7_blocks(jnp.asarray(blocks), quality=1.0)
    wf = np.ascontiguousarray(np.asarray(wf))
    dec_f = native.decode_bc7(wf)[..., :3].astype(np.float64)

    with Pool(2) as p:
        wr = np.concatenate(p.map(_ref_chunk, np.array_split(blocks, 8)))
    wr = np.ascontiguousarray(wr)
    dec_r = native.decode_bc7(wr)[..., :3].astype(np.float64)

    sse_f = ((dec_f - src) ** 2).sum(axis=(1, 2))
    sse_r = ((dec_r - src) ** 2).sum(axis=(1, 2))
    mf = _mode_of(wf)
    mr = _mode_of(wr)
    print(f"total SSE fw {sse_f.sum():.0f} ref {sse_r.sum():.0f} "
          f"delta {sse_f.sum() - sse_r.sum():+.0f}")
    print("by REF mode: refmode  count  SSEdelta(fw-ref)  fw-mode-hist")
    for mode in range(8):
        sel = mr == mode
        if not sel.any():
            continue
        hist = np.bincount(mf[sel], minlength=8)
        print(f"  m{mode}: n={sel.sum():4d}  "
              f"d={float((sse_f[sel] - sse_r[sel]).sum()):+10.0f}  "
              f"fw={list(hist)}")
    worst = np.argsort(sse_f - sse_r)[-8:][::-1]
    print("worst blocks (idx, refmode, fwmode, d):")
    for i in worst:
        print(f"  {i} m{mr[i]} m{mf[i]} {sse_f[i]-sse_r[i]:+.0f}")


if __name__ == "__main__":
    main()

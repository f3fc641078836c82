"""Rank the reference's chosen mode-7 partition under candidate estimators.

The bc7_full_alpha residue was pinned on mode 7's estimator-ranked
partition shortlist (scripts/diag_alpha_modes.py). This diag avoids the
~30-min q1 encode compile entirely: it refcpu-encodes the alpha corpus,
bit-parses the winning (mode, partition) per block, and for every
ref-mode-7 block asks where that partition ranks under

  (a) the bounds-axis estimator (_estimate_partitions_vec), and
  (b) the PCA-axis estimator (_estimate_partitions_pca),

reporting the shortlist-size -> hit-rate curve for each. The estimator
whose top-K contains the reference winner most often bounds the achievable
parity for a given full-fit budget.

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/diag_mode7_rank.py [nblocks]
"""
import os
import sys
from multiprocessing import get_context

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

    from gfx_imagecompress_tpu.bench_quality import corpus_blocks
    from gfx_imagecompress_tpu.kernels.bc7_full import (
        _estimate_partitions_pca, _estimate_partitions_vec)

    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    blocks = corpus_blocks(16, 64, "gradient")[:nb]

    cache = f"/tmp/ref_words_grad_{nb}.npy"
    if os.path.exists(cache):
        wr = np.load(cache)
    else:
        with get_context("spawn").Pool(4) as p:
            wr = np.concatenate(
                p.map(_ref_chunk, np.array_split(blocks, 16)))
        np.save(cache, wr)
    modes = _mode_of(wr)
    sel = modes == 7
    print(f"{sel.sum()}/{nb} blocks chose mode 7 in the reference")
    if not sel.any():
        return
    # mode 7 layout: 8 mode bits, then 6 partition bits (bc7_body bti[7])
    part_ref = (wr[sel, 0] >> 8) & 0x3F
    pts = jnp.asarray(blocks[sel].astype(np.float32) * 255.0)

    plist = tuple(range(64))
    for name, fn in (("bounds", _estimate_partitions_vec),
                     ("pca", _estimate_partitions_pca)):
        est = np.asarray(fn(pts, 2, plist, 4))          # (N,64)
        order = np.argsort(est, axis=1)                  # best-first
        rank = np.argmax(order == part_ref[:, None], axis=1)
        hits = {k: float((rank < k).mean()) for k in (1, 4, 8, 12, 16, 24)}
        print(f"  {name:7s} mean-rank {rank.mean():5.2f}  " +
              "  ".join(f"top{k}:{v:.2f}" for k, v in hits.items()))


if __name__ == "__main__":
    main()

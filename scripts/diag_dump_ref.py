"""Capture the reference BC7 q1 words for the 4k quality corpus once, so
mode-level experiments (scripts/diag_m0_exp.py) can iterate without paying
the ~40 min refcpu encode each time. Run CPU-only:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/diag_dump_ref.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from gfx_imagecompress_tpu.bench_quality import corpus_blocks, ref_encode


def main():
    blocks = corpus_blocks(16, 64, "opaque")
    w_ref = ref_encode("bc7_full", dict(quality=1.0), blocks, procs=4)
    np.savez_compressed("/tmp/diag_ref_4k.npz", blocks=blocks, w_ref=w_ref)
    print("saved", blocks.shape, w_ref.shape)


if __name__ == "__main__":
    main()

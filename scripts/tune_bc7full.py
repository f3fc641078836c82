"""Tune bc7_full q1 budgets on-chip: corpus PSNR (native-oracle decode) vs
throughput for (topk, iters, shake, uber) combos. Not a test."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from gfx_imagecompress_tpu.bench_quality import corpus_blocks, _decode_psnr
    from gfx_imagecompress_tpu.kernels.bc7_full_pallas import (
        encode_bc7_blocks_pallas)

    blocks = corpus_blocks(4, 64, "opaque")          # 1024 blocks
    b = jnp.asarray(blocks)
    big = jnp.asarray(np.tile(blocks, (16, 1, 1)))   # timing batch

    combos = {
        "default": dict(),
        "topk6": dict(_topk=6),
        "topk4": dict(_topk=4),
        "uber2": dict(_uber=2),
        "topk4uber2": dict(_topk=4, _uber=2),
        "topk6uber3": dict(_topk=6, _uber=3),
        "topk4uber3": dict(_topk=4, _uber=3),
        "shake2": dict(_shake=2),
        "shake1": dict(_shake=1),
        "t256": dict(tile=256),
        "shake2uber3": dict(_shake=2, _uber=3),
        "plist8": dict(_plist=tuple(range(8))),
        "plist16": dict(_plist=tuple(range(16))),
        "plist32": dict(_plist=tuple(range(32))),
    }
    sel = sys.argv[1].split(",") if len(sys.argv) > 1 else list(combos)
    for name in sel:
        kw = combos[name]
        enc = partial(encode_bc7_blocks_pallas, quality=1.0, **kw)
        w, _ = enc(b)
        w.block_until_ready()
        psnr = _decode_psnr("bc7", np.ascontiguousarray(np.asarray(w)),
                            blocks)
        # time on the bigger batch, warm
        w2, _ = enc(big)
        w2.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            w2, _ = enc(big)
        w2.block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        mt = big.shape[0] * 16 / dt / 1e6
        print(f"{name:24s} PSNR {psnr:.4f}  ~{mt:6.1f} Mtexel/s", flush=True)


if __name__ == "__main__":
    main()

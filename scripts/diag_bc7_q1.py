"""Per-block diagnostic: where does BC7-full q1 lose vs the reference?

Encodes the quality-corpus blocks with both the framework (XLA path) and
the refcpu AMD comparator, decodes both with the native oracle, and breaks
the per-block SSE delta down by (ref mode, fw mode). Run CPU-only:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/diag_bc7_q1.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from gfx_imagecompress_tpu import native
from gfx_imagecompress_tpu.bench_quality import corpus_blocks, ref_encode


def mode_of(words):
    b0 = words[:, 0] & 0xFF
    out = np.zeros(len(b0), np.int32)
    for m in range(8):
        out[(b0 & ((1 << (m + 1)) - 1)) == (1 << m)] = m
    return out


def main():
    blocks = corpus_blocks(16, 64, "opaque")   # the 4k quality corpus
    print(f"{len(blocks)} blocks", file=sys.stderr)

    w_ref = ref_encode("bc7_full", dict(quality=1.0), blocks, procs=4)
    import jax.numpy as jnp
    from gfx_imagecompress_tpu.kernels.bc7_full import encode_bc7_blocks
    w_fw, _ = encode_bc7_blocks(jnp.asarray(blocks), quality=1.0)
    w_fw = np.asarray(w_fw)

    src = np.rint(blocks[..., :3] * 255.0)
    d_ref = native.decode_bc7(w_ref)[..., :3].astype(np.float64)
    d_fw = native.decode_bc7(np.ascontiguousarray(w_fw))[..., :3].astype(
        np.float64)
    e_ref = ((d_ref - src) ** 2).sum(axis=(1, 2))
    e_fw = ((d_fw - src) ** 2).sum(axis=(1, 2))

    m_ref = mode_of(w_ref)
    m_fw = mode_of(w_fw)
    delta = e_fw - e_ref          # >0 = we lose
    tot = delta.sum()
    print(f"total SSE delta fw-ref: {tot:.0f} "
          f"(fw {e_fw.sum():.0f}, ref {e_ref.sum():.0f})")
    print("\nloss by (ref_mode, fw_mode), top 12 by delta:")
    keys = {}
    for rm, fm, d in zip(m_ref, m_fw, delta):
        k = (int(rm), int(fm))
        a = keys.setdefault(k, [0.0, 0])
        a[0] += d
        a[1] += 1
    for k, (d, c) in sorted(keys.items(), key=lambda kv: -kv[1][0])[:12]:
        print(f"  ref m{k[0]} -> fw m{k[1]}: n={c:4d}  delta={d:10.0f}")
    print("\nmode histograms: ref", np.bincount(m_ref, minlength=8),
          " fw", np.bincount(m_fw, minlength=8))
    worst = np.argsort(-delta)[:10]
    print("\nworst blocks:", [(int(i), int(m_ref[i]), int(m_fw[i]),
                               round(float(delta[i]), 1)) for i in worst])


if __name__ == "__main__":
    main()

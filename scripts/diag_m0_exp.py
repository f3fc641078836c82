"""Mode-0 search experiments against the cached reference words
(/tmp/diag_ref_4k.npz from scripts/diag_dump_ref.py).

Encodes the ref-chose-mode-0 blocks with the framework's mode-0 search at
various budgets and compares decoded SSE per block vs the reference's.
Run CPU-only (keeps the TPU free):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/diag_m0_exp.py [config ...]
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from gfx_imagecompress_tpu import native


def mode_of(words):
    b0 = words[:, 0] & 0xFF
    out = np.zeros(len(b0), np.int32)
    for m in range(8):
        out[(b0 & ((1 << (m + 1)) - 1)) == (1 << m)] = m
    return out


def main():
    import jax.numpy as jnp
    from gfx_imagecompress_tpu.kernels.bc7_full import (BC7_MODES,
                                                        encode_single_mode)
    d = np.load("/tmp/diag_ref_4k.npz")
    blocks, w_ref = d["blocks"], d["w_ref"]
    m_ref = mode_of(w_ref)
    sel = m_ref == 0
    b0 = blocks[sel]
    src = np.rint(b0[..., :3] * 255.0)
    d_ref = native.decode_bc7(np.ascontiguousarray(w_ref[sel]))[..., :3]
    e_ref = ((d_ref.astype(np.float64) - src) ** 2).sum(axis=(1, 2))
    print(f"{sel.sum()} ref-m0 blocks; ref SSE {e_ref.sum():.0f}",
          file=sys.stderr, flush=True)

    mode0 = BC7_MODES[0]
    pts = jnp.asarray(b0[..., :3] * 255.0)
    w = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)
    plist16 = tuple(range(16))

    configs = {
        "base":   dict(topk=16, iters=3, shake_rounds=3, uber=4),
        "iters6": dict(topk=16, iters=6, shake_rounds=3, uber=4),
        "shake6": dict(topk=16, iters=3, shake_rounds=6, uber=4),
        "uber6":  dict(topk=16, iters=3, shake_rounds=3, uber=6),
        "all_up": dict(topk=16, iters=6, shake_rounds=6, uber=6),
        "uber8":  dict(topk=16, iters=3, shake_rounds=3, uber=8),
        "uber6_s0": dict(topk=16, iters=3, shake_rounds=0, uber=6),
        "uber6_fullp": dict(topk=16, iters=3, shake_rounds=3, uber=6,
                            _fullp=True),
        "uber12": dict(topk=16, iters=3, shake_rounds=3, uber=12),
    }
    only = sys.argv[1:] or list(configs)
    for name in only:
        kw = dict(configs[name])
        fullp = kw.pop("_fullp", False)
        import gfx_imagecompress_tpu.kernels.bc7_full as B
        orig = B._quant_subset
        if fullp:
            def forced(pts_, m_, mode_, e0_, e1_, w_, analytic=True, **kw_):
                return orig(pts_, m_, mode_, e0_, e1_, w_, analytic=False)
            B._quant_subset = forced
        try:
            import jax
            jax.clear_caches()
            err, words = encode_single_mode(pts, mode0, w, plist16,
                                            cand_parts=None, **kw)
        finally:
            B._quant_subset = orig
        wf = np.ascontiguousarray(np.asarray(words))
        d_fw = native.decode_bc7(wf)[..., :3]
        e_fw = ((d_fw.astype(np.float64) - src) ** 2).sum(axis=(1, 2))
        delta = e_fw.sum() - e_ref.sum()
        worse = int((e_fw > e_ref + 0.5).sum())
        better = int((e_fw < e_ref - 0.5).sum())
        print(f"{name:8s} fw SSE {e_fw.sum():9.0f}  delta {delta:+9.0f}  "
              f"blocks worse/better {worse}/{better}", flush=True)


if __name__ == "__main__":
    main()

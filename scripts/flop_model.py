"""Generate the per-block flop/byte model used by bench.py's MFU fields.

Methodology (VERDICT r4 item 4): the shipping kernels are Pallas custom
calls, opaque to XLA cost analysis — but each has an algorithmically
identical jnp twin (parity-tested in tests/). We compile the twins on the
CPU backend at the bench-config settings and read XLA's own HLO cost
analysis, giving modeled flops/block without hand-counting. Fused configs
are compositions of the twins that exist (bc5 = 2x bc4 on two channels;
bc2/bc3 = 4-colour RGB engine + their alpha encoders), mirroring how the
fused Pallas kernels are built (kernels/bc1_pallas.py).

Bytes are the HBM I/O contract of one block (input pixels + 8/16B output),
NOT XLA's bytes-accessed (which counts intermediates that live in
VMEM/registers on the TPU path).

Writes flops_model.json at the repo root. Re-run after kernel edits that
change search budgets. Run on CPU: JAX_PLATFORMS=cpu python
scripts/flop_model.py [config ...]
"""
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 256  # blocks to lower with; flops scale linearly, divided out below

OUT = os.path.join(os.path.dirname(__file__), "..", "flops_model.json")


def _flops(fn, *args):
    import jax
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)) / N


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gfx_imagecompress_tpu.kernels.bc1 import (encode_bc1_blocks,
                                                   encode_rgb_blocks)
    from gfx_imagecompress_tpu.kernels.bc4 import (encode_bc2_alpha_blocks,
                                                   encode_bc4_blocks)
    from gfx_imagecompress_tpu.kernels.bc6h import encode_bc6h_blocks
    from gfx_imagecompress_tpu.kernels.bc7_fast import encode_bc7_fast_blocks
    from gfx_imagecompress_tpu.kernels.bc7_full import encode_bc7_blocks
    from gfx_imagecompress_tpu.options import PERCEPTUAL_WEIGHTS

    rng = np.random.default_rng(0)
    b4 = jnp.asarray(rng.random((N, 16, 4), np.float32))
    b3 = jnp.asarray(rng.random((N, 16, 3), np.float32))
    b1 = jnp.asarray(rng.random((N, 16), np.float32))

    sel = set(sys.argv[1:])

    def want(k):
        return not sel or k in sel

    model = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            model = json.load(f)
    model.setdefault("_method", (
        "flops/block from XLA cost analysis of the jnp twin kernels at "
        "bench-config settings (see scripts/flop_model.py docstring); "
        "bytes/block is the HBM I/O contract (pixels in + packed block out)"
    ))

    # bench.py API-default settings per config
    if want("bc1"):
        f = _flops(partial(encode_bc1_blocks, weights=PERCEPTUAL_WEIGHTS),
                   b4)
        model["bc1"] = {"flops_per_block": f,
                        "bytes_per_block": 16 * 4 * 4 + 8}
        print("bc1", f)
    if want("bc4"):
        f = _flops(encode_bc4_blocks, b1)
        model["bc4"] = {"flops_per_block": f,
                        "bytes_per_block": 16 * 4 + 8}
        print("bc4", f)
    if want("bc5"):
        f = 2 * model.get("bc4", {}).get("flops_per_block", 0)
        # two channels read from an (N,16,4) input
        model["bc5"] = {"flops_per_block": f,
                        "bytes_per_block": 16 * 4 * 4 + 16,
                        "composed": "2 x bc4"}
        print("bc5", f)
    if want("bc3"):
        fc = _flops(partial(encode_rgb_blocks, weights=PERCEPTUAL_WEIGHTS),
                    b4)
        fa = _flops(encode_bc4_blocks, b1)
        model["bc3"] = {"flops_per_block": fc + fa,
                        "bytes_per_block": 16 * 4 * 4 + 16,
                        "composed": "rgb(4-colour) + bc4 alpha"}
        print("bc3", fc + fa)
    if want("bc2"):
        fc = _flops(partial(encode_rgb_blocks, weights=PERCEPTUAL_WEIGHTS),
                    b4)
        fa = _flops(encode_bc2_alpha_blocks, b1)
        model["bc2"] = {"flops_per_block": fc + fa,
                        "bytes_per_block": 16 * 4 * 4 + 16,
                        "composed": "rgb(4-colour) + 4-bit alpha"}
        print("bc2", fc + fa)
    if want("bc6h"):
        f = _flops(partial(encode_bc6h_blocks, signed=False), b3)
        model["bc6h"] = {"flops_per_block": f,
                         "bytes_per_block": 16 * 3 * 4 + 16}
        print("bc6h", f)
    if want("bc7_fast"):
        f = _flops(partial(encode_bc7_fast_blocks, fast=True,
                           perceptual=False), b4)
        model["bc7_fast"] = {"flops_per_block": f,
                             "bytes_per_block": 16 * 4 * 4 + 16}
        print("bc7_fast", f)
    if want("bc7_full"):
        f = _flops(encode_bc7_blocks, b4)
        model["bc7_full"] = {"flops_per_block": f,
                             "bytes_per_block": 16 * 4 * 4 + 16}
        print("bc7_full", f)

    with open(OUT, "w") as f:
        json.dump(model, f, indent=1)
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()

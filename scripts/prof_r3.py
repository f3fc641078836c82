"""Round-3 on-chip profiling: attribute the round-2 regressions.

Times kernel variants with feature knobs to locate cost. Not a test.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def marginal(encode, blocks, n_lo=1, n_hi=5, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(b, n):
        def body(i, acc):
            out = encode(b + (i % 2).astype(b.dtype) * 1e-7)
            w = out[0] if isinstance(out, tuple) else out
            return acc + jnp.sum(w.ravel().astype(jnp.uint32))
        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    _ = np.asarray(run(blocks, 1))
    times = {}
    for n in (n_lo, n_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(run(blocks, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def main():
    import jax.numpy as jnp
    from functools import partial
    from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

    rng = np.random.default_rng(0)

    def photo(h, w, c=4):
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([np.sin(x * 0.05) * 0.4 + 0.5,
                        np.cos(y * 0.04) * 0.4 + 0.5,
                        np.sin((x + y) * 0.03) * 0.3 + 0.5,
                        np.ones_like(x)], -1)[..., :c]
        img += rng.normal(0, 0.01, img.shape).astype(np.float32)
        return np.clip(img, 0, 1).astype(np.float32)

    b1k = image_to_blocks(jnp.asarray(photo(1024, 1024)[None]))
    texels = 1024 * 1024

    which = sys.argv[1] if len(sys.argv) > 1 else "bc7fast"

    if which == "bc7fast":
        from gfx_imagecompress_tpu.kernels.bc7_fast_pallas import (
            encode_bc7_fast_blocks_pallas as enc)
        for name, kw in [
            ("fast(default knobs)", dict(fast=True, perceptual=False)),
            ("fast,topk=0-ish(plist=(0,))", dict(fast=True, perceptual=False,
                                                 _plist=(0,), _topk=1)),
            ("fast,topk=1", dict(fast=True, perceptual=False, _topk=1)),
        ]:
            dt = marginal(partial(enc, **kw), b1k, n_lo=1, n_hi=3)
            print(f"bc7fast {name}: {texels/dt/1e6:.1f} Mtexel/s")
    elif which == "bc6h":
        from gfx_imagecompress_tpu.kernels.bc6h_pallas import (
            encode_bc6h_blocks_pallas as enc)
        hdr = np.exp(photo(1024, 1024, 3).astype(np.float32) * 4.0)
        bh = image_to_blocks(jnp.asarray(hdr[None]))
        dt = marginal(partial(enc, signed=False), bh, n_lo=1, n_hi=3)
        print(f"bc6h uf default: {texels/dt/1e6:.1f} Mtexel/s")
    elif which == "bc7fast_parts":
        import jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from gfx_imagecompress_tpu.kernels import bc7_fast_pallas as K

        x = image_to_blocks(jnp.asarray(photo(1024, 1024)[None]))
        n = x.shape[0]
        tile = 256
        xt = x.transpose(2, 1, 0).reshape(64, n)
        solid = K._solid_inputs(x)
        F32, I32, U32 = K.F32, K.I32, K.U32

        def run_variant(name, body):
            def kern(x_ref, solid_ref, w0, w1, w2, w3, err_ref):
                xs = [x_ref[16 * c:16 * (c + 1), :].astype(F32) * 255.0
                      for c in range(4)]
                ms = K._to_metric_rows(xs, False)
                sr = [solid_ref[c:c + 1, :] for c in range(7)]
                cols, err = body(xs, ms, sr)
                w0[:] = cols[0]
                w1[:] = cols[1]
                w2[:] = cols[2]
                w3[:] = cols[3]
                err_ref[:] = err

            @jax.jit
            def enc(xx):
                xxt = xx.transpose(2, 1, 0).reshape(64, xx.shape[0])
                sol = K._solid_inputs(xx)
                outs = pl.pallas_call(
                    kern, grid=(xx.shape[0] // tile,),
                    in_specs=[pl.BlockSpec((64, tile), lambda i: (0, i),
                                           memory_space=pltpu.VMEM),
                              pl.BlockSpec((7, tile), lambda i: (0, i),
                                           memory_space=pltpu.VMEM)],
                    out_specs=tuple(
                        pl.BlockSpec((1, tile), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
                        for _ in range(5)),
                    out_shape=tuple(
                        [jax.ShapeDtypeStruct((1, xx.shape[0]), U32)] * 4
                        + [jax.ShapeDtypeStruct((1, xx.shape[0]), F32)]),
                )(xxt, sol)
                return jnp.stack([o[0] for o in outs[:4]], 1), outs[4][0]

            dt = marginal(enc, x, n_lo=1, n_hi=3)
            print(f"bc7fast_part {name}: {1024*1024/dt/1e6:.1f} Mtexel/s"
                  f" ({dt*1e3:.2f} ms)")

        def mode6_only(xs, ms, sr):
            st6 = K._mode6(xs, ms, False, 0)
            return K._pack_mode6(st6), st6["err"]

        def mode1_only(xs, ms, sr):
            st1 = K._mode1(xs[:3], ms[:3], False, K.FAST_PARTITIONS, 2, 0,
                           None)
            return K._pack_mode1(st1), st1["err"]

        def mode1_noest(xs, ms, sr):
            zero = jnp.zeros_like(xs[0][0:1], K.I32)
            st1 = K._mode1(xs[:3], ms[:3], False, K.FAST_PARTITIONS, 2, 0,
                           None, part_ids=[zero, zero + 1])
            return K._pack_mode1(st1), st1["err"]

        def solid_only(xs, ms, sr):
            st = K._solid_candidate(ms[:3], False, sr)
            st["sub"] = [r + jnp.zeros_like(st["pid"]) for r in st["sub"]]
            return K._pack_mode1(st), st["err"]

        def nearly_empty(xs, ms, sr):
            z = jnp.zeros_like(xs[0][0:1], U32)
            return [z, z, z, z], xs[0][0:1] + xs[1][0:1]

        run_variant("nearly empty kernel", nearly_empty)
        run_variant("mode6 only", mode6_only)
        run_variant("mode1 only(est24+k2)", mode1_only)
        run_variant("mode1 only(fixed 2 parts)", mode1_noest)
        run_variant("solid only", solid_only)

        @jax.jit
        def just_transform(xx):
            xxt = xx.transpose(2, 1, 0).reshape(64, xx.shape[0])
            sol = K._solid_inputs(xx)
            return jnp.sum(xxt.astype(jnp.float32)) + jnp.sum(sol)

        dt = marginal(just_transform, x, n_lo=1, n_hi=3)
        print(f"bc7fast_part transpose+solid XLA only: {dt*1e3:.2f} ms")

        @jax.jit
        def just_transpose(xx):
            xxt = xx.transpose(2, 1, 0).reshape(64, xx.shape[0])
            return jnp.sum(xxt.astype(jnp.float32))

        dt = marginal(just_transpose, x, n_lo=1, n_hi=3)
        print(f"bc7fast_part transpose XLA only: {dt*1e3:.2f} ms")
    elif which.startswith("bc7full"):
        from gfx_imagecompress_tpu.kernels.bc7_full_pallas import (
            encode_bc7_blocks_pallas as enc)
        b512 = image_to_blocks(jnp.asarray(photo(512, 512)[None]))
        tex = 512 * 512
        variants = {
            "all": dict(),
            "m1": dict(mode_mask=0x02),
            "m6": dict(mode_mask=0x40),
            "m0": dict(mode_mask=0x01),
            "m2": dict(mode_mask=0x04),
            "m3": dict(mode_mask=0x08),
            "m7": dict(mode_mask=0x80),
            "m4": dict(mode_mask=0x10),
            "m5": dict(mode_mask=0x20),
            "shake0": dict(_shake=0),
            "uber0": dict(_uber=0),
            "topk2": dict(_topk=2),
            "floor": dict(_topk=1, _shake=0, _uber=0),
            "floor_m1": dict(_topk=1, _shake=0, _uber=0, mode_mask=0x02),
            "floor_m0": dict(_topk=1, _shake=0, _uber=0, mode_mask=0x01),
            "floor_m7": dict(_topk=1, _shake=0, _uber=0, mode_mask=0x80),
            "race_m1": dict(_shake=0, _uber=0, mode_mask=0x02),
            "race_m7": dict(_shake=0, _uber=0, mode_mask=0x80),
            "race_m2": dict(_shake=0, _uber=0, mode_mask=0x04),
        }
        sel = which.split(":", 1)[1].split(",") if ":" in which \
            else list(variants)
        for name in sel:
            kw = variants[name]
            dt = marginal(partial(enc, **kw), b512, n_lo=1, n_hi=2)
            print(f"bc7full {name}: {tex/dt/1e6:.2f} Mtexel/s"
                  f"  ({dt*1e3:.1f} ms)", flush=True)
    elif which == "bc1":
        from gfx_imagecompress_tpu.kernels.bc1_pallas import (
            encode_bc1_blocks_pallas as enc)
        imgs = jnp.asarray(np.stack([photo(256, 256)] * 64))
        blocks = image_to_blocks(imgs)
        dt = marginal(enc, blocks)
        print(f"bc1 default: {64*256*256/dt/1e6:.1f} Mtexel/s")


if __name__ == "__main__":
    main()

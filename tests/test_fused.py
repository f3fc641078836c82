"""Fused BC2/BC3/BC5 single-launch kernels vs their composed equivalents.

The fused kernels run the identical searches on the same rows, so the
emitted words must match the composition bit-for-bit (same op order) —
and decode must agree with the independent native oracle.
"""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.kernels.bc1_pallas import (
    encode_bc1_blocks_pallas, encode_bc2_blocks_pallas,
    encode_bc3_blocks_pallas)
from gfx_imagecompress_tpu.kernels.bc4_pallas import (
    encode_bc4_blocks_pallas, encode_bc5_blocks_pallas)
from gfx_imagecompress_tpu.kernels.bc4 import encode_bc2_alpha_blocks
from gfx_imagecompress_tpu.options import PERCEPTUAL_WEIGHTS


def _blocks(n=48, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.random((n, 1, 4), np.float32)
    d = rng.normal(0, 0.07, (n, 16, 4)).astype(np.float32)
    return jnp.asarray(np.clip(base + d, 0, 1))


def test_bc5_fused_matches_two_bc4():
    b = _blocks()
    wf, ef = encode_bc5_blocks_pallas(b, tile=8)
    wr, er = encode_bc4_blocks_pallas(b[:, :, 0], tile=8)
    wg, eg = encode_bc4_blocks_pallas(b[:, :, 1], tile=8)
    np.testing.assert_array_equal(np.asarray(wf),
                                  np.concatenate([wr, wg], 1))
    np.testing.assert_allclose(np.asarray(ef), np.asarray(er + eg),
                               rtol=1e-6)


def test_bc3_fused_matches_composition():
    b = _blocks(seed=9)
    wf, ef = encode_bc3_blocks_pallas(b, tile=8)
    cw, ce = encode_bc1_blocks_pallas(b, weights=PERCEPTUAL_WEIGHTS,
                                      allow_three=False, tile=8)
    aw, ae = encode_bc4_blocks_pallas(b[:, :, 3], tile=8)
    np.testing.assert_array_equal(np.asarray(wf),
                                  np.concatenate([aw, cw], 1))


def test_bc2_fused_matches_composition():
    b = _blocks(seed=13)
    wf, ef = encode_bc2_blocks_pallas(b, tile=8)
    cw, ce = encode_bc1_blocks_pallas(b, weights=PERCEPTUAL_WEIGHTS,
                                      allow_three=False, tile=8)
    aw, ae = encode_bc2_alpha_blocks(b[:, :, 3])
    np.testing.assert_array_equal(np.asarray(wf),
                                  np.concatenate([np.asarray(aw), cw], 1))


def test_bc5_native_oracle():
    from gfx_imagecompress_tpu import native
    b = _blocks(seed=21)
    wf, _ = encode_bc5_blocks_pallas(b, tile=8)
    dec = native.decode_bc5(np.ascontiguousarray(np.asarray(wf)))
    src = np.rint(np.asarray(b)[..., :2] * 255.0)
    mse = ((dec[..., :2].astype(np.float64) - src) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 30.0

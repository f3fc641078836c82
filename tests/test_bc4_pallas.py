"""Pallas BC4 kernel vs the XLA reference implementation (CPU interpret)."""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.decode.bcn import decode_bc4_block
from gfx_imagecompress_tpu.kernels.bc4 import encode_bc4_blocks
from gfx_imagecompress_tpu.kernels.bc4_pallas import encode_bc4_blocks_pallas


def test_matches_xla_bitexact(rng):
    vals = rng.random((24, 16), dtype=np.float32)
    wp, ep = encode_bc4_blocks_pallas(jnp.asarray(vals), tile=8)
    wx, ex = encode_bc4_blocks(jnp.asarray(vals))
    np.testing.assert_array_equal(np.asarray(wp), np.asarray(wx))
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ex), rtol=1e-5)


def test_error_model_matches_decoder(rng):
    vals = rng.random((16, 16), dtype=np.float32)
    wp, ep = encode_bc4_blocks_pallas(jnp.asarray(vals), tile=8)
    dec = np.asarray(decode_bc4_block(wp))
    rec = ((np.asarray(jnp.asarray(vals)) * 255.0 - dec) ** 2).sum(axis=1)
    np.testing.assert_allclose(rec, np.asarray(ep), rtol=1e-4, atol=0.5)


def test_padding_tail(rng):
    vals = rng.random((5, 16), dtype=np.float32)
    wp, ep = encode_bc4_blocks_pallas(jnp.asarray(vals), tile=8)
    wx, _ = encode_bc4_blocks(jnp.asarray(vals))
    assert wp.shape == (5, 2)
    np.testing.assert_array_equal(np.asarray(wp), np.asarray(wx))

"""Pallas BC6H kernel vs the XLA reference (CPU interpret, reduced budget)."""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.decode.bc6h import decode_bc6h_half
from gfx_imagecompress_tpu.kernels.bc6h import (encode_bc6h_blocks,
                                                f32_to_half_int)
from gfx_imagecompress_tpu.kernels.bc6h_pallas import (
    encode_bc6h_blocks_pallas)
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

from test_bc6h import hdr_image


def _roundtrip(signed):
    img = hdr_image(8, 8, seed=71, signed=signed)
    b = image_to_blocks(jnp.asarray(img[None]))
    wp, ep = encode_bc6h_blocks_pallas(b, tile=4, quality=0.3, signed=signed)
    wx, ex = encode_bc6h_blocks(b, quality=0.3, signed=signed)
    return b, wp, np.asarray(ep), np.asarray(ex)


def test_matches_xla_and_decodes_unsigned():
    b, wp, ep, ex = _roundtrip(False)
    assert ep.sum() <= ex.sum() * 1.001 + 1.0
    hd = np.asarray(decode_bc6h_half(wp, signed=False))
    tgt = np.asarray(f32_to_half_int(b, False))
    rec = ((tgt.astype(np.float64) - hd) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, ep, rtol=1e-4, atol=0.5)


def test_matches_xla_and_decodes_signed():
    b, wp, ep, ex = _roundtrip(True)
    assert ep.sum() <= ex.sum() * 1.001 + 1.0
    hd = np.asarray(decode_bc6h_half(wp, signed=True))
    dec = np.where(hd >= 0x8000, -(hd & 0x7FFF), hd)
    tgt = np.asarray(f32_to_half_int(b, True))
    rec = ((tgt.astype(np.float64) - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, ep, rtol=1e-4, atol=0.5)

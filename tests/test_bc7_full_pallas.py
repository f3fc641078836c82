"""Pallas full-BC7 kernel (CPU interpret, restricted mode masks to bound
interpret cost; the all-modes path is exercised on TPU)."""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.decode.bc7 import decode_bc7
from gfx_imagecompress_tpu.kernels.bc7_full_pallas import (
    encode_bc7_blocks_pallas)
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

from conftest import photo_rgba


def _rt(mode_mask, seed=81, alpha=None):
    img = photo_rgba(8, 8, seed=seed)
    if alpha is not None:
        img[..., 3] = alpha
    b = image_to_blocks(jnp.asarray(img[None]))
    wp, ep = encode_bc7_blocks_pallas(b, tile=4, quality=0.25,
                                      mode_mask=mode_mask,
                                      _plist=(0, 1), _topk=1)
    dec = np.asarray(decode_bc7(wp))
    src = np.asarray(b) * 255.0
    rec = ((src - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, np.asarray(ep), rtol=1e-4, atol=0.5)
    byte0 = np.asarray(wp)[:, 0] & 0xFF
    return set((int(v) & -int(v)).bit_length() - 1 for v in byte0)


def test_three_subset_mode0_packs_and_decodes():
    modes = _rt(0x01)
    assert modes == {0}


def test_two_subset_mode3_packs_and_decodes():
    modes = _rt(0x08)
    assert modes == {3}


def test_dual_mode5_packs_and_decodes():
    modes = _rt(0x20, alpha=0.6)
    assert modes == {5}


def test_mode7_alpha_packs_and_decodes():
    modes = _rt(0x80, alpha=0.6)
    assert modes == {7}

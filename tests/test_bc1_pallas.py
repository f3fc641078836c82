"""Pallas BC1 kernel vs the XLA reference implementation.

Runs in interpreter mode on CPU (small batches): quality must match the
XLA kernel and every emitted block must satisfy the decode-exact error
model."""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.decode.bcn import decode_bc1
from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks
from gfx_imagecompress_tpu.kernels.bc1_pallas import encode_bc1_blocks_pallas
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

from conftest import photo_rgba


def _blocks(seed, h=16, w=16):
    return image_to_blocks(jnp.asarray(photo_rgba(h, w, seed=seed)[None]))


def test_matches_xla_quality():
    b = _blocks(51)
    wp, ep = encode_bc1_blocks_pallas(b, tile=8)
    wx, ex = encode_bc1_blocks(b)
    ep, ex = np.asarray(ep), np.asarray(ex)
    # identical search -> same result up to float-tie resolution
    assert ep.sum() <= ex.sum() * 1.001 + 1.0
    assert (np.asarray(wp) == np.asarray(wx)).all(axis=1).mean() > 0.9


def test_error_model_matches_decoder():
    b = _blocks(52)
    wp, ep = encode_bc1_blocks_pallas(b, tile=8)
    dec = np.asarray(decode_bc1(wp))
    src = np.asarray(b) * 255.0
    w = np.array([0.3086, 0.6094, 0.0820])
    rec = (((src[..., :3] - dec[..., :3]) ** 2) * w).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, ep, rtol=1e-4, atol=0.5)


def test_padding_tail():
    """N not divisible by the tile: padded blocks must not leak."""
    b = _blocks(53, 12, 12)  # 9 blocks
    wp, ep = encode_bc1_blocks_pallas(b, tile=8)
    assert wp.shape == (9, 2)
    wx, _ = encode_bc1_blocks(b)
    assert (np.asarray(wp) == np.asarray(wx)).all(axis=1).mean() > 0.8


def test_punch_through_alpha_mask_bit_exact():
    """Fused punch-through path: transparent pixels decode transparent
    (index 3 of the 3-colour mode), opaque pixels decode opaque, and the
    masked error model stays decode-exact."""
    img = photo_rgba(16, 16, seed=55)
    img[..., 3] = 1.0
    img[::3, ::2, 3] = 0.2          # punch holes
    b = image_to_blocks(jnp.asarray(img[None]))
    wp, ep = encode_bc1_blocks_pallas(b, tile=8, use_alpha=True,
                                      alpha_threshold=0.5)
    dec = np.asarray(decode_bc1(wp))            # (N,16,4) with alpha
    src = np.asarray(b)
    opaque = src[..., 3] >= 0.5
    assert (np.asarray(dec[..., 3] > 127) == opaque).all()
    w = np.array([0.3086, 0.6094, 0.0820])
    rec = ((((src[..., :3] * 255.0 - dec[..., :3]) ** 2) * w)
           * opaque[..., None]).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, ep, rtol=1e-4, atol=0.5)
    # parity with the XLA punch-through path
    wx, ex = encode_bc1_blocks(b, alpha_threshold=0.5, use_alpha=True)
    assert np.asarray(ep).sum() <= np.asarray(ex).sum() * 1.001 + 1.0


def test_force_four_mode():
    b = _blocks(54)
    wp, ep = encode_bc1_blocks_pallas(b, tile=8, allow_three=False)
    dec = np.asarray(decode_bc1(wp, force_four=True))
    src = np.asarray(b) * 255.0
    w = np.array([0.3086, 0.6094, 0.0820])
    rec = (((src[..., :3] - dec[..., :3]) ** 2) * w).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, ep, rtol=1e-4, atol=0.5)

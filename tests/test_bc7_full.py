"""Full BC7 (all 8 modes) encoder tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from gfx_imagecompress_tpu.decode.bc7 import decode_bc7
from gfx_imagecompress_tpu.kernels.bc7_full import encode_bc7_blocks
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

from conftest import gradient_rgba, photo_rgba, psnr


def _rt(img, **kw):
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, err = encode_bc7_blocks(blocks, **kw)
    dec = np.asarray(decode_bc7(words))
    src = np.asarray(blocks) * 255.0
    return np.asarray(words), dec, src, np.asarray(err)


def _modes(words):
    byte0 = words[:, 0] & 0xFF
    return np.array([(int(b) & -int(b)).bit_length() - 1 for b in byte0])


def test_error_model_matches_decoder():
    img = photo_rgba(16, 16, seed=11)
    words, dec, src, err = _rt(img, quality=0.6)
    recomputed = ((src - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(recomputed, err, rtol=1e-4, atol=0.5)


def test_error_model_matches_decoder_with_alpha():
    img = photo_rgba(16, 16, seed=12)
    y = np.mgrid[0:16, 0:16][0].astype(np.float32)
    img[..., 3] = y / 15.0
    words, dec, src, err = _rt(img, quality=0.6)
    recomputed = ((src - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(recomputed, err, rtol=1e-4, atol=0.5)
    # alpha blocks must decode alpha well (modes 4-7 available)
    assert psnr(src[..., 3], dec[..., 3]) > 35


def test_full_beats_or_matches_fast():
    from gfx_imagecompress_tpu.kernels.bc7_fast import encode_bc7_fast_blocks
    img = photo_rgba(32, 32, seed=13)
    b = image_to_blocks(jnp.asarray(img[None]))
    _, e_fast = encode_bc7_fast_blocks(b, fast=True, perceptual=False)
    _, e_full = encode_bc7_blocks(b, quality=0.6)
    assert np.asarray(e_full).sum() <= np.asarray(e_fast).sum() * 1.001


def test_mode_mask_restricts():
    img = photo_rgba(16, 16, seed=14)
    for mask, allowed in ((0x40, {6}), (0x02, {1}), (0x22, {1, 5})):
        words, dec, src, err = _rt(img, mode_mask=mask, quality=0.3)
        assert set(_modes(words).tolist()) <= allowed


def test_quality_budget_monotonic():
    img = photo_rgba(32, 32, seed=15)
    b = image_to_blocks(jnp.asarray(img[None]))
    _, e_low = encode_bc7_blocks(b, quality=0.2)
    _, e_high = encode_bc7_blocks(b, quality=0.6)
    assert np.asarray(e_high).sum() <= np.asarray(e_low).sum() * 1.001


def test_gradient_high_quality():
    img = gradient_rgba(32, 32)
    img[..., 3] = 1.0
    words, dec, src, err = _rt(img, quality=0.6)
    assert psnr(src, dec) > 40


@pytest.mark.slow
def test_max_quality_decode_exact_and_monotonic():
    """Full q=1.0 budgets (topk8/shake3/uber4): decode-exact error model
    and no regression vs q=0.6. Heavy compile -> RUN_SLOW gate."""
    img = photo_rgba(16, 16, seed=16)
    words, dec, src, err = _rt(img, quality=1.0)
    recomputed = ((src - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(recomputed, err, rtol=1e-4, atol=0.5)
    b = image_to_blocks(jnp.asarray(img[None]))
    _, e_mid = encode_bc7_blocks(b, quality=0.6)
    assert np.asarray(err).sum() <= np.asarray(e_mid).sum() * 1.001

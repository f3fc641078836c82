"""Fast BC7 (modes 1+6) encoder tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from gfx_imagecompress_tpu.decode.bc7 import decode_bc7
from gfx_imagecompress_tpu.kernels.bc7_fast import encode_bc7_fast_blocks

from conftest import gradient_rgba, noise_rgba, photo_rgba, psnr
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks


def _rt(img, **kw):
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, err = encode_bc7_fast_blocks(blocks, **kw)
    dec = np.asarray(decode_bc7(words))
    src = np.asarray(blocks) * 255.0
    return np.asarray(words), dec, src, np.asarray(err)


def test_mode_bits_valid():
    img = noise_rgba(16, 16, seed=0)
    words, dec, src, err = _rt(img, fast=True)
    byte0 = words[:, 0] & 0xFF
    assert (byte0 != 0).all()
    modes = np.array([(int(b) & -int(b)).bit_length() - 1 for b in byte0])
    assert set(modes.tolist()) <= {1, 6}


def test_encoder_error_model_matches_decoder():
    """The error the encoder reports must equal the squared error recomputed
    from the decoded ints — proves packer/decoder/internal model agree."""
    img = noise_rgba(32, 32, seed=2)
    words, dec, src, err = _rt(img, fast=True, perceptual=False)
    recomputed = ((src - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(recomputed, err, rtol=1e-4, atol=0.5)


def test_alpha_blocks_use_mode6():
    img = photo_rgba(16, 16, seed=3)
    img[..., 3] = 0.5
    words, dec, src, err = _rt(img, fast=True)
    byte0 = words[:, 0] & 0xFF
    modes = np.array([(int(b) & -int(b)).bit_length() - 1 for b in byte0])
    assert (modes == 6).all()
    assert psnr(src, dec) > 30


@pytest.mark.slow
def test_quality_opaque():
    img = photo_rgba(32, 32, seed=4)
    words, dec, src, err = _rt(img, perceptual=False)
    assert psnr(src[..., :3], dec[..., :3]) > 36
    assert (dec[..., 3] == 255).all()


def test_gradient_quality():
    img = gradient_rgba(64, 64)
    words, dec, src, err = _rt(img, fast=True, perceptual=False)
    assert psnr(src, dec) > 40


@pytest.mark.slow
def test_fast_vs_full_tradeoff():
    img = photo_rgba(32, 32, seed=5)
    b = image_to_blocks(jnp.asarray(img[None]))
    _, ef = encode_bc7_fast_blocks(b, fast=True, perceptual=False)
    _, eq = encode_bc7_fast_blocks(b, fast=False, perceptual=False)
    assert np.asarray(eq).sum() <= np.asarray(ef).sum() * 1.001


def test_solid_blocks_near_lossless():
    img = np.zeros((8, 8, 4), np.float32)
    img[:4] = [0.2, 0.6, 0.9, 1.0]
    img[4:] = [1.0, 0.0, 0.0, 1.0]
    words, dec, src, err = _rt(img, fast=True, perceptual=False)
    assert psnr(src, dec) > 45

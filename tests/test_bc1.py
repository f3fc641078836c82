"""BC1 encoder tests: decode round-trip quality + format invariants."""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.decode.bcn import decode_bc1
from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

from conftest import checker_rgb, gradient_rgba, noise_rgba, psnr, punch_through, solid_image


def _encode_decode(img, **kw):
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, err = encode_bc1_blocks(blocks, **kw)
    dec = decode_bc1(words)
    src = np.asarray(blocks) * 255.0
    return np.asarray(words), np.asarray(dec), src, np.asarray(err)


def test_solid_primaries_high_psnr():
    for rgba in ([1, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 1], [0.5, 0.25, 0.75, 1]):
        img = solid_image(16, 16, rgba)
        _, dec, src, _ = _encode_decode(img)
        assert psnr(src[..., :3], dec[..., :3]) > 40, rgba


def test_mode_bits_legal():
    """Blocks must satisfy the c0>c1 (4-colour) / c0<=c1 (3-colour) encoding
    rule implicitly — i.e. decode must reconstruct what the encoder modelled."""
    img = noise_rgba(32, 32, seed=1)
    words, dec, src, err = _encode_decode(img)
    # independent recompute of the error from decoded ints must match err
    w = np.array([0.3086, 0.6094, 0.0820])
    d = (src[..., :3] - dec[..., :3]) ** 2
    recomputed = (d * w).sum(axis=(1, 2))
    np.testing.assert_allclose(recomputed, err, rtol=1e-4, atol=0.5)


def test_gradient_quality():
    img = gradient_rgba(64, 64)
    _, dec, src, _ = _encode_decode(img)
    assert psnr(src[..., :3], dec[..., :3]) > 30


def test_checker_quality():
    img = checker_rgb(32, 32)
    _, dec, src, _ = _encode_decode(img)
    # black/white/primary checkers quantize exactly per-block
    assert psnr(src[..., :3], dec[..., :3]) > 25


def test_punch_through_alpha():
    img = punch_through(32, 32)
    words, dec, src, _ = _encode_decode(
        img, use_alpha=True, alpha_threshold=0.5)
    src_a = src[..., 3] >= 128
    dec_a = dec[..., 3] > 0
    np.testing.assert_array_equal(dec_a, src_a)
    # opaque pixels keep reasonable colour
    m = src_a
    assert psnr(src[..., :3][m], dec[..., :3][m]) > 20


def test_all_transparent_block():
    img = solid_image(8, 8, [0.3, 0.4, 0.5, 0.0])
    words, dec, _, _ = _encode_decode(img, use_alpha=True, alpha_threshold=0.5)
    assert (np.asarray(dec)[..., 3] == 0).all()


def test_refinement_monotonic_quality():
    img = noise_rgba(32, 32, seed=7)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    _, err1 = encode_bc1_blocks(blocks, refinement_steps=1)
    _, err3 = encode_bc1_blocks(blocks, refinement_steps=3, b3d_refinement=True)
    assert np.asarray(err3).sum() <= np.asarray(err1).sum() * 1.02

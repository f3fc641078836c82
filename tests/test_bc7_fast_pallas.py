"""Pallas fast-BC7 kernel vs the XLA reference (CPU interpret, tiny batches)."""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.decode.bc7 import decode_bc7
from gfx_imagecompress_tpu.kernels.bc7_fast import encode_bc7_fast_blocks
from gfx_imagecompress_tpu.kernels.bc7_fast_pallas import (
    encode_bc7_fast_blocks_pallas)
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

from conftest import photo_rgba


def _blocks(seed, h=16, w=16):
    return image_to_blocks(jnp.asarray(photo_rgba(h, w, seed=seed)[None]))


def test_matches_xla_quality_and_decodes():
    # fast budget on CPU: interpret-mode cost of the 64-partition default
    # path is prohibitive; the default path is exercised on TPU (verify)
    b = _blocks(61)
    wp, ep = encode_bc7_fast_blocks_pallas(b, tile=16, fast=True,
                                           perceptual=False,
                                           _plist=(0, 1, 13), _topk=1)
    wx, ex = encode_bc7_fast_blocks(b, fast=True, perceptual=False)
    # reduced partition shortlist on CPU -> small tolerance (full-budget
    # quality parity is verified on TPU)
    assert float(jnp.sum(ep)) <= float(jnp.sum(ex)) * 1.5 + 1.0
    dec = np.asarray(decode_bc7(wp))
    src = np.asarray(b) * 255.0
    rec = ((src - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, np.asarray(ep), rtol=1e-4, atol=0.5)


def test_alpha_blocks_decode_exact():
    img = photo_rgba(16, 16, seed=62)
    img[..., 3] = 0.3
    b = image_to_blocks(jnp.asarray(img[None]))
    wp, ep = encode_bc7_fast_blocks_pallas(b, tile=16, fast=True,
                                           perceptual=False,
                                           _plist=(0, 1, 13), _topk=1)
    modes = [(int(x) & -int(x)).bit_length() - 1
             for x in np.asarray(wp)[:, 0] & 0xFF]
    assert set(modes) == {6}
    dec = np.asarray(decode_bc7(wp))
    src = np.asarray(b) * 255.0
    rec = ((src - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, np.asarray(ep), rtol=1e-4, atol=0.5)


def test_fast_budget_runs():
    b = _blocks(63)
    wp, ep = encode_bc7_fast_blocks_pallas(b, tile=16, fast=True,
                                           perceptual=False,
                                           _plist=(0, 1, 13), _topk=1)
    dec = np.asarray(decode_bc7(wp))
    src = np.asarray(b) * 255.0
    rec = ((src - dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(rec, np.asarray(ep), rtol=1e-4, atol=0.5)


def test_uber_perceptual_solid_paths_decode_exact():
    """Exercises the uber selector rounds, the YCbCr metric, and the
    single-colour candidate (solid sub-image) at tiny budget."""
    img = photo_rgba(8, 16, seed=64)
    img[:4, :8] = [0.2, 0.55, 0.8, 1.0]          # solid region
    b = image_to_blocks(jnp.asarray(img[None]))
    wp, ep = encode_bc7_fast_blocks_pallas(b, tile=8, fast=True,
                                           perceptual=True,
                                           _plist=(0, 13), _topk=1,
                                           _uber=1)
    # decode-exactness is checked in RGB squared error via the non-perceptual
    # reported err of the XLA path on identical words: here just decode and
    # bound the PSNR (perceptual err units differ from plain SSE).
    dec = np.asarray(decode_bc7(wp))
    src = np.asarray(b) * 255.0
    mse = ((src[..., :3] - dec[..., :3]) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 30
    # uber must not lose to the no-uber run under the same metric
    _, e0 = encode_bc7_fast_blocks_pallas(b, tile=8, fast=True,
                                          perceptual=True,
                                          _plist=(0, 13), _topk=1,
                                          _uber=0)
    assert float(jnp.sum(ep)) <= float(jnp.sum(e0)) * 1.0001

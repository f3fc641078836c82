"""Block-level API parity tests (blockapi.py <-> imagecompress.h:103-142)."""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu import blockapi, native

from conftest import photo_rgba
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks


def test_rgb_single_mode_blocks():
    img = photo_rgba(8, 8, seed=41)
    blocks = image_to_blocks(jnp.asarray(img[None]))[:, :, :3]
    words = blockapi.compress_rgb_single_mode_blocks(blocks)
    assert words.shape == (4, 2)
    dec = native.decode_bc1(np.asarray(words), force_four=True)
    src = np.asarray(blocks) * 255
    assert np.abs(dec[..., :3].astype(float) - src).mean() < 8


def test_alpha_and_explicit_alpha_blocks(rng):
    a = rng.random((8, 16), dtype=np.float32)
    w1 = blockapi.compress_alpha_single_mode_blocks(a)
    w2 = blockapi.compress_explicit_alpha_blocks(a)
    assert w1.shape == (8, 2) and w2.shape == (8, 2)
    dec = native.decode_bc4(np.asarray(w1))
    assert np.abs(dec.astype(float) - a * 255).mean() < 8


def test_bc1_blocks_with_threshold():
    img = photo_rgba(8, 8, seed=42)
    img[..., 3] = 0.25
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words = blockapi.compress_bc1_blocks(blocks, alpha_threshold=0.5)
    dec = native.decode_bc1(np.asarray(words))
    assert (dec[..., 3] == 0).all()  # all below threshold -> transparent


def test_richgel999_bc7enc16_blocks():
    img = (photo_rgba(8, 8, seed=43) * 255).astype(np.uint32)
    packed = (img[..., 0] | (img[..., 1] << 8) | (img[..., 2] << 16)
              | (img[..., 3] << 24))
    blocks = image_to_blocks(jnp.asarray(packed[None, :, :, None]))[:, :, 0]
    words = blockapi.compress_richgel999_bc7enc16_blocks(np.asarray(blocks))
    assert words.shape == (4, 4)
    dec = native.decode_bc7(np.asarray(words))
    src = np.stack([(np.asarray(blocks) >> s) & 0xFF for s in (0, 8, 16, 24)],
                   axis=-1)
    assert np.abs(dec.astype(float) - src).mean() < 10

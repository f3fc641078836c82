"""Block layout round-trip tests (pipeline/blocks.py).

Covers the reference's edge-clamp gather semantics (block_utils.cpp:7-41) and
NPOT round-up (tests/test_imagecompress.cpp:146-165: 257 -> 260).
"""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.formats import block_count
from gfx_imagecompress_tpu.pipeline.blocks import (
    blocks_to_image, image_to_blocks, pad_to_blocks)


def test_block_count_rounds_up():
    assert block_count(256) == 64
    assert block_count(257) == 65  # 257 -> 260 stored
    assert block_count(1) == 1
    assert block_count(4) == 1
    assert block_count(5) == 2


def test_roundtrip_pot(rng):
    img = rng.random((1, 16, 32, 4), dtype=np.float32)
    blocks = image_to_blocks(jnp.asarray(img))
    assert blocks.shape == (4 * 8, 16, 4)
    out = blocks_to_image(blocks, 1, 16, 32)
    np.testing.assert_array_equal(np.asarray(out), img)


def test_roundtrip_npot(rng):
    img = rng.random((2, 257, 13, 3), dtype=np.float32)
    blocks = image_to_blocks(jnp.asarray(img))
    assert blocks.shape == (2 * 65 * 4, 16, 3)
    out = blocks_to_image(blocks, 2, 257, 13)
    np.testing.assert_array_equal(np.asarray(out), img)


def test_edge_clamp_replicates_last():
    img = np.arange(5 * 6 * 1, dtype=np.float32).reshape(1, 5, 6, 1)
    padded = np.asarray(pad_to_blocks(jnp.asarray(img)))
    assert padded.shape == (1, 8, 8, 1)
    # rows 5..7 replicate row 4; cols 6..7 replicate col 5
    np.testing.assert_array_equal(padded[0, 5:, :6, 0],
                                  np.broadcast_to(padded[0, 4, :6, 0], (3, 6)))
    np.testing.assert_array_equal(padded[0, :5, 6:, 0],
                                  np.broadcast_to(padded[0, :5, 5, 0][:, None],
                                                  (5, 2)))


def test_block_pixel_order_is_row_major():
    # pixel (y, x) of block must land at block[y*4+x]
    img = np.zeros((1, 4, 4, 1), np.float32)
    for y in range(4):
        for x in range(4):
            img[0, y, x, 0] = y * 4 + x
    blocks = np.asarray(image_to_blocks(jnp.asarray(img)))
    np.testing.assert_array_equal(blocks[0, :, 0], np.arange(16))

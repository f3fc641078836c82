"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from gfx_imagecompress_tpu.dist.sharded import (gather_words, make_mesh,
                                                shard_encode)
from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks
from gfx_imagecompress_tpu.kernels.bc4 import encode_bc4_blocks
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

from conftest import photo_rgba


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_bc1_matches_single_device():
    img = photo_rgba(64, 64, seed=21)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    ref_words, ref_err = encode_bc1_blocks(blocks)
    mesh = make_mesh()
    words, err, mse = shard_encode(encode_bc1_blocks, blocks, mesh)
    np.testing.assert_array_equal(gather_words(words), np.asarray(ref_words))
    np.testing.assert_allclose(np.asarray(err), np.asarray(ref_err),
                               rtol=1e-5)
    expect = float(np.asarray(ref_err).sum()) / (blocks.shape[0] * 16)
    np.testing.assert_allclose(float(mse), expect, rtol=1e-5)


def test_sharded_non_divisible_block_count():
    """NPOT image -> block count not divisible by 8; padding must not leak."""
    img = photo_rgba(20, 36, seed=22)  # 5x9 = 45 blocks
    blocks = image_to_blocks(jnp.asarray(img[None]))
    assert blocks.shape[0] % 8 != 0
    ref_words, _ = encode_bc1_blocks(blocks)
    words, err, _ = shard_encode(encode_bc1_blocks, blocks, make_mesh())
    np.testing.assert_array_equal(gather_words(words), np.asarray(ref_words))


def test_sharded_bc4():
    img = photo_rgba(32, 32, seed=23)
    blocks = image_to_blocks(jnp.asarray(img[None]))[:, :, 0]
    ref_words, _ = encode_bc4_blocks(blocks)
    words, err, _ = shard_encode(encode_bc4_blocks, blocks, make_mesh())
    np.testing.assert_array_equal(gather_words(words), np.asarray(ref_words))


def test_sharded_pallas_bc1_matches_single_device():
    """Fused Pallas kernel under shard_map: per-device kernels, no comms."""
    from functools import partial

    from gfx_imagecompress_tpu.dist.sharded import shard_encode_pallas
    from gfx_imagecompress_tpu.kernels.bc1_pallas import (
        encode_bc1_blocks_pallas)

    img = photo_rgba(32, 32, seed=24)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    enc = partial(encode_bc1_blocks_pallas, tile=8)
    ref_words, ref_err = enc(blocks)
    words, err, mse = shard_encode_pallas(enc, blocks, make_mesh())
    np.testing.assert_array_equal(gather_words(words), np.asarray(ref_words))
    expect = float(np.asarray(ref_err).sum()) / (blocks.shape[0] * 16)
    np.testing.assert_allclose(float(mse), expect, rtol=1e-5)


def test_init_multihost_single_process_noop(monkeypatch):
    """Single-process env: init_multihost must be a safe no-op."""
    from gfx_imagecompress_tpu.dist.sharded import init_multihost
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_multihost() is False


def test_gather_words_global_single_process():
    from gfx_imagecompress_tpu.dist.sharded import gather_words_global
    img = photo_rgba(16, 16, seed=25)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, err, _ = shard_encode(encode_bc1_blocks, blocks, make_mesh())
    ref_words, _ = encode_bc1_blocks(blocks)
    np.testing.assert_array_equal(gather_words_global(words),
                                  np.asarray(ref_words))

"""Cross-check: JAX decoders vs the independent native C++ oracle.

Every emitted block format must decode IDENTICALLY under both
implementations (and for random foreign bitstreams too) — this is the
bit-exact round-trip guarantee of BASELINE.md."""
import numpy as np
import jax.numpy as jnp
import pytest

from gfx_imagecompress_tpu import native
from gfx_imagecompress_tpu.decode import bcn
from gfx_imagecompress_tpu.decode.bc7 import decode_bc7
from gfx_imagecompress_tpu.decode.bc6h import decode_bc6h_half
from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks
from gfx_imagecompress_tpu.kernels.bc4 import encode_bc4_blocks
from gfx_imagecompress_tpu.kernels.bc7_fast import encode_bc7_fast_blocks
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks

from conftest import photo_rgba


def _words(n, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**32, size=(n, w), dtype=np.uint64).astype(
        np.uint32)


def test_bc1_emitted_blocks_agree():
    img = photo_rgba(32, 32, seed=31)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, _ = encode_bc1_blocks(blocks)
    jax_dec = np.asarray(bcn.decode_bc1(words))
    nat_dec = native.decode_bc1(np.asarray(words))
    np.testing.assert_array_equal(jax_dec, nat_dec)


def test_bc1_random_bitstreams_agree():
    words = _words(512, 2, 1)
    jax_dec = np.asarray(bcn.decode_bc1(jnp.asarray(words)))
    nat_dec = native.decode_bc1(words)
    np.testing.assert_array_equal(jax_dec, nat_dec)


def test_bc4_random_bitstreams_agree():
    words = _words(512, 2, 2)
    jax_dec = np.asarray(bcn.decode_bc4_block(jnp.asarray(words)))
    nat_dec = native.decode_bc4(words)
    np.testing.assert_array_equal(jax_dec, nat_dec)


def test_bc4_emitted_blocks_agree(rng):
    vals = rng.random((128, 16), dtype=np.float32)
    words, _ = encode_bc4_blocks(jnp.asarray(vals))
    np.testing.assert_array_equal(
        np.asarray(bcn.decode_bc4_block(words)),
        native.decode_bc4(np.asarray(words)))


def test_bc3_random_bitstreams_agree():
    words = _words(256, 4, 3)
    np.testing.assert_array_equal(
        np.asarray(bcn.decode_bc3(jnp.asarray(words))),
        native.decode_bc3(words))


def test_bc2_random_bitstreams_agree():
    words = _words(256, 4, 4)
    np.testing.assert_array_equal(
        np.asarray(bcn.decode_bc2(jnp.asarray(words))),
        native.decode_bc2(words))


def test_bc7_emitted_blocks_agree():
    img = photo_rgba(32, 32, seed=32)
    img[..., 3] = np.linspace(0, 1, 32 * 32).reshape(32, 32)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, _ = encode_bc7_fast_blocks(blocks)
    np.testing.assert_array_equal(
        np.asarray(decode_bc7(words)).astype(np.uint8),
        native.decode_bc7(np.asarray(words)))


def test_bc7_full_emitted_blocks_agree():
    from gfx_imagecompress_tpu.kernels.bc7_full import encode_bc7_blocks
    img = photo_rgba(16, 16, seed=33)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, _ = encode_bc7_blocks(blocks, quality=0.4)
    np.testing.assert_array_equal(
        np.asarray(decode_bc7(words)).astype(np.uint8),
        native.decode_bc7(np.asarray(words)))


def test_bc6h_emitted_blocks_agree():
    from gfx_imagecompress_tpu.kernels.bc6h import encode_bc6h_blocks
    from test_bc6h import hdr_image
    img = hdr_image(16, 16, seed=34)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    for signed in (False, True):
        words, _ = encode_bc6h_blocks(blocks, signed=signed, quality=0.2)
        jax_dec = np.asarray(decode_bc6h_half(words, signed=signed))
        nat_dec = native.decode_bc6h(np.asarray(words), signed=signed)
        np.testing.assert_array_equal(jax_dec.astype(np.uint16), nat_dec)

"""BC6H encoder/decoder tests (signed + unsigned).

Encodes are cached per config (the 14-mode encoder is compile-heavy); all
assertions share the cached results."""
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.decode.bc6h import (decode_bc6h, decode_bc6h_half,
                                               half_bits_to_f32)
from gfx_imagecompress_tpu.kernels.bc6h import (encode_bc6h_blocks,
                                                f32_to_half_int)
from gfx_imagecompress_tpu.pipeline.blocks import image_to_blocks


def hdr_image(h, w, seed=0, scale=10.0, signed=False):
    """Environment-map-like HDR field: smooth exponent variation with
    *multiplicative* noise (absolute noise would swamp the small-magnitude
    channels and no HDR codec could represent it)."""
    r = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        np.exp(np.sin(x * 0.09) * 2.0),
        np.exp(np.cos(y * 0.07) * 1.5) * 0.3,
        (np.sin((x + y) * 0.05) * 0.5 + 0.6) * scale,
    ], axis=-1).astype(np.float32)
    img *= (1.0 + r.normal(0, 0.01, img.shape)).astype(np.float32)
    if signed:
        img[..., 1] *= -1.0
    return img


@lru_cache(maxsize=None)
def _encoded(signed: bool, mode_mask: int = 0xFFFF):
    img = hdr_image(32, 32, seed=3, signed=signed)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, err = encode_bc6h_blocks(blocks, signed=signed,
                                    mode_mask=mode_mask)
    return blocks, np.asarray(words), np.asarray(err)


def _half_targets(blocks, signed):
    return np.asarray(f32_to_half_int(blocks, signed))


def test_error_model_matches_decoder_unsigned():
    blocks, words, err = _encoded(False)
    half_dec = np.asarray(decode_bc6h_half(jnp.asarray(words), signed=False))
    tgt = _half_targets(blocks, False)
    recomputed = ((tgt.astype(np.float64) - half_dec) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(recomputed, err, rtol=1e-4, atol=0.5)


def test_error_model_matches_decoder_signed():
    blocks, words, err = _encoded(True)
    half_dec = np.asarray(decode_bc6h_half(jnp.asarray(words), signed=True))
    dec_signed = np.where(half_dec >= 0x8000, -(half_dec & 0x7FFF), half_dec)
    tgt = _half_targets(blocks, True)
    recomputed = ((tgt.astype(np.float64) - dec_signed) ** 2).sum(axis=(1, 2))
    np.testing.assert_allclose(recomputed, err, rtol=1e-4, atol=0.5)


def test_hdr_quality_unsigned():
    blocks, words, err = _encoded(False)
    dec = np.asarray(decode_bc6h(jnp.asarray(words), signed=False))
    src_h = np.asarray(half_bits_to_f32(f32_to_half_int(blocks, False)))
    dec = dec.reshape(src_h.shape)
    rel = np.abs(dec - src_h) / (np.abs(src_h) + 1e-3)
    assert np.median(rel) < 0.02, np.median(rel)
    assert np.mean(rel) < 0.04, np.mean(rel)


def test_hdr_quality_signed():
    blocks, words, err = _encoded(True)
    dec = np.asarray(decode_bc6h(jnp.asarray(words), signed=True))
    sh = _half_targets(blocks, True)
    dec_h = np.asarray(f32_to_half_int(jnp.asarray(dec), True)).reshape(
        sh.shape)
    # sign must be preserved for all non-tiny values
    assert (np.sign(dec_h) == np.sign(sh))[np.abs(sh) > 64].all()


def test_solid_blocks_near_exact():
    img = np.full((8, 8, 3), 3.14159, np.float32)
    blocks = image_to_blocks(jnp.asarray(img[None]))
    words, err = encode_bc6h_blocks(blocks)
    dec = np.asarray(decode_bc6h(words))
    rel = np.abs(dec - 3.140625) / 3.140625  # 3.14159 in f16 ~ 3.140625
    assert rel.max() < 0.01


def test_mode_field_is_valid():
    _, words, _ = _encoded(False)
    valid5 = {0x02, 0x06, 0x0A, 0x0E, 0x12, 0x16, 0x1A, 0x1E,
              0x03, 0x07, 0x0B, 0x0F}
    for w0 in words[:, 0]:
        assert (w0 & 3) in (0, 1) or int(w0 & 0x1F) in valid5


def test_mode_mask_one_region_only():
    # enable only modes 11-14 (1-region): bits 10..13
    _, words, err = _encoded(False, 0b11110000000000)
    codes5 = words[:, 0] & 0x1F
    assert set(int(c) for c in codes5) <= {0x03, 0x07, 0x0B, 0x0F}
    assert np.isfinite(err).all()


def test_masked_overflow_graceful_fallback():
    """Transformed-only mask (modes 1-9 = 0x1FF) on overflow-inducing
    content must still emit valid, finite encodings — the reference
    degrades to a solid block (amd_bc6h_body.cpp:118, 1639-1645); here a
    solid-mean candidate on an enabled mode joins the race (VERDICT r4
    item 6). Checked on BOTH paths."""
    from gfx_imagecompress_tpu.kernels.bc6h_pallas import (
        encode_bc6h_blocks_pallas)

    # alternate huge positive / tiny values: deltas overflow every
    # transformed mode's field at any base precision
    r = np.random.default_rng(7)
    vals = np.where(r.random((64, 16, 3)) < 0.5, 60000.0, 1e-4)
    blocks = jnp.asarray(vals.astype(np.float32))
    # quality=0.3 keeps the compile cheap; the fallback machinery is
    # quality-independent (it joins the race after the budgeted sweep)
    for enc in (encode_bc6h_blocks,
                lambda b, **kw: encode_bc6h_blocks_pallas(b, tile=4, **kw)):
        words, err = enc(blocks, signed=False, mode_mask=0x1FF, quality=0.3)
        err = np.asarray(err)
        assert np.isfinite(err).all()
        wn = np.asarray(words)
        # only enabled (2-region, transformed) mode codes may appear
        allowed = {0x00, 0x01, 0x02, 0x06, 0x0A, 0x0E, 0x12, 0x16, 0x1A}
        for w0 in wn[:, 0]:
            code = int(w0 & 3) if int(w0 & 3) in (0, 1) else int(w0 & 0x1F)
            assert code in allowed
        dec = np.asarray(decode_bc6h(jnp.asarray(wn), signed=False))
        assert np.isfinite(dec).all()
        assert (dec >= 0.0).all() and (dec <= 65504.0).all()

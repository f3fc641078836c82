"""BC4/BC5/BC2-alpha scalar encoder tests."""
import numpy as np
import jax.numpy as jnp

from gfx_imagecompress_tpu.decode.bcn import (
    decode_bc2_alpha, decode_bc4_block)
from gfx_imagecompress_tpu.kernels.bc4 import (
    encode_bc2_alpha_blocks, encode_bc4_blocks)

from conftest import psnr


def _roundtrip(vals):
    words, err = encode_bc4_blocks(jnp.asarray(vals))
    dec = np.asarray(decode_bc4_block(words))
    return np.asarray(words), dec, np.asarray(err)


def test_solid_values_exact():
    for v in (0.0, 1.0, 128 / 255.0, 37 / 255.0):
        vals = np.full((3, 16), v, np.float32)
        _, dec, err = _roundtrip(vals)
        np.testing.assert_array_equal(dec, np.round(v * 255))
        assert (err < 1e-3).all()


def test_two_value_blocks_exact():
    """Blocks with exactly two distinct byte values must encode losslessly
    (endpoints can sit exactly on them)."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(64, 1))
    b = rng.integers(0, 256, size=(64, 1))
    pick = rng.integers(0, 2, size=(64, 16))
    vals = np.where(pick == 0, a, b).astype(np.float32) / 255.0
    _, dec, err = _roundtrip(vals)
    np.testing.assert_array_equal(dec, np.round(vals * 255))


def test_extremes_use_six_point_mode():
    """A block mixing 0, 255 and a narrow mid-range cluster is the 6-point
    ramp's home turf (amd_bcx_helpers.cpp:132-138 race)."""
    vals = np.array([[0, 0, 255, 255, 100, 102, 104, 106,
                      101, 103, 105, 100, 102, 104, 0, 255]],
                    np.float32) / 255.0
    _, dec, err = _roundtrip(vals)
    src = np.round(vals * 255)
    assert psnr(src, dec) > 35


def _brute_force_optimal_err(vals255):
    """True optimal BC4 error by enumerating all 65536 endpoint pairs."""
    a0 = np.arange(256)[:, None]
    a1 = np.arange(256)[None, :]
    best = np.full(vals255.shape[0], np.inf)
    for mode8 in (True, False):
        pal = np.zeros((256, 256, 8))
        pal[:, :, 0] = np.broadcast_to(a0, (256, 256))
        pal[:, :, 1] = np.broadcast_to(a1, (256, 256))
        for i in range(2, 8):
            if mode8:
                pal[:, :, i] = ((8 - i) * a0 + (i - 1) * a1 + 3) // 7
            elif i < 6:
                pal[:, :, i] = ((6 - i) * a0 + (i - 1) * a1 + 2) // 5
            else:
                pal[:, :, i] = 0 if i == 6 else 255
        legal = (a0 > a1) if mode8 else (a0 <= a1)
        for b in range(vals255.shape[0]):
            d = (vals255[b][None, None, :, None] - pal[:, :, None, :]) ** 2
            e = d.min(-1).sum(-1)
            e[~np.broadcast_to(legal, e.shape)] = np.inf
            best[b] = min(best[b], e.min())
    return best


def test_near_optimal_vs_brute_force(rng):
    vals = rng.random((6, 16), dtype=np.float32)
    _, dec, err = _roundtrip(vals)
    src = np.asarray(jnp.asarray(vals), np.float64) * 255.0
    achieved = ((src - dec) ** 2).sum(axis=1)
    optimal = _brute_force_optimal_err(src)
    # within 15% of the exhaustive-search optimum on random blocks
    assert (achieved <= optimal * 1.15 + 1.0).all(), (achieved, optimal)


def test_gradient_quality(rng):
    vals = np.linspace(0, 1, 16, dtype=np.float32)[None].repeat(8, 0)
    vals = vals + rng.normal(0, 0.01, vals.shape).astype(np.float32)
    vals = np.clip(vals, 0, 1)
    _, dec, err = _roundtrip(vals)
    # a full-range ramp quantized to 8 levels tops out near ~30 dB
    assert psnr(np.round(vals * 255), dec) > 28


def test_random_quality(rng):
    vals = rng.random((256, 16), dtype=np.float32)
    _, dec, err = _roundtrip(vals)
    assert psnr(np.round(vals * 255), dec) > 30
    # err output must equal recomputed decode error
    src = np.asarray(jnp.asarray(vals)) * 255.0
    recomputed = ((src - dec) ** 2).sum(axis=1)
    np.testing.assert_allclose(recomputed, err, rtol=1e-4, atol=0.5)


def test_bc2_alpha_matches_reference_quantizer():
    vals = np.arange(256, dtype=np.float32)[None].repeat(16, 0)
    vals = vals.reshape(16, 16, 16)[:, 0, :] / 255.0  # arbitrary 16-px blocks
    words, _ = encode_bc2_alpha_blocks(jnp.asarray(vals))
    dec = np.asarray(decode_bc2_alpha(words))
    # reference scalar formula (amd_bcx_helpers.cpp:115-121)
    c = np.round(vals * 255).astype(np.int64)
    hi = c >> 4
    q = np.minimum((c + np.where(hi < 8, 7, 8) - hi) >> 4, 15)
    np.testing.assert_array_equal(dec, q * 17)

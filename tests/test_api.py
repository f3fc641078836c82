"""Public API integration tests — mirrors the reference test matrix
(tests/test_imagecompress.cpp, SURVEY.md §4) with a *stronger* oracle:
every compressed result is decoded and PSNR-checked, not just
metadata-checked."""
import numpy as np
import pytest

import gfx_imagecompress_tpu as gic
from gfx_imagecompress_tpu.decode import decode_image

from conftest import checker_rgb, gradient_rgba, psnr, punch_through, solid_image


def _img(arr, **kw):
    return gic.Image.from_array(arr, **kw)


def test_bc1_256_metadata_and_quality():
    src = checker_rgb(64, 64)
    out = gic.compress(gic.CompressType.DXBC1, _img(src))
    assert out is not None
    assert out.format == gic.BlockFormat.BC1_UNORM
    assert (out.width, out.height, out.slices) == (64, 64, 1)
    assert out.blocks.shape == (1, 16, 16, 2)
    dec = decode_image(out)
    assert psnr(src[..., :3] * 255, dec[0, ..., :3]) > 25


def test_bc1_npot_rounds_up():
    """257 -> 260 stored (test_imagecompress.cpp:146-165)."""
    src = gradient_rgba(37, 257)
    out = gic.compress(gic.CompressType.DXBC1, _img(src))
    assert (out.width, out.height) == (257, 37)
    assert (out.stored_width, out.stored_height) == (260, 40)
    assert out.blocks.shape == (1, 10, 65, 2)
    dec = decode_image(out)
    assert dec.shape == (1, 37, 257, 4)


def test_bc1_punch_through():
    src = punch_through(32, 32)
    out = gic.compress_amd_bc1(
        _img(src), options=gic.BC1Options(use_alpha=True, alpha_threshold=128))
    dec = decode_image(out)
    np.testing.assert_array_equal(dec[0, ..., 3] > 0, src[..., 3] >= 0.5)


def test_bc2_and_bc3():
    src = gradient_rgba(32, 32)
    for ctype, fmt in ((gic.CompressType.DXBC2, gic.BlockFormat.BC2_UNORM),
                       (gic.CompressType.DXBC3, gic.BlockFormat.BC3_UNORM)):
        out = gic.compress(ctype, _img(src))
        assert out.format == fmt
        assert out.blocks.shape == (1, 8, 8, 4)
        dec = decode_image(out)
        assert psnr(src * 255, dec[0]) > 30, ctype


def test_bc4_and_bc5():
    src = gradient_rgba(32, 32)
    out4 = gic.compress(gic.CompressType.DXBC4, _img(src))
    assert out4.format == gic.BlockFormat.BC4_UNORM
    dec4 = decode_image(out4)
    # BC4 compresses channel 0 (R) — NOT channel 1 (the reference's bug)
    assert psnr(src[..., 0] * 255, dec4[0, ..., 0]) > 35
    out5 = gic.compress(gic.CompressType.DXBC5, _img(src))
    assert out5.format == gic.BlockFormat.BC5_UNORM
    dec5 = decode_image(out5)
    assert psnr(src[..., :2] * 255, dec5[0]) > 35


def test_srgb_formats():
    src = checker_rgb(16, 16)
    out = gic.compress_amd_bc1(_img(src, srgb=True))
    assert out.format == gic.BlockFormat.BC1_SRGB


def test_unimplemented_codecs_return_none():
    src = checker_rgb(16, 16)
    assert gic.compress(gic.CompressType.ASTC, _img(src)) is None
    assert gic.compress(gic.CompressType.ETC_RGB, _img(src)) is None


def test_pick_compression_type():
    rgba = _img(checker_rgb(8, 8))
    gray = _img(checker_rgb(8, 8)[..., :1])
    rg = _img(checker_rgb(8, 8)[..., :2])
    rgb = _img(checker_rgb(8, 8)[..., :3])
    hdr = _img(checker_rgb(8, 8), hdr=True)
    F = gic.PickFlags
    assert gic.pick_compression_type(F.ALLOW_DXBC1TO5, gray) == gic.CompressType.DXBC4
    assert gic.pick_compression_type(F.ALLOW_DXBC1TO5, rg) == gic.CompressType.DXBC5
    assert gic.pick_compression_type(F.ALLOW_DXBC1TO5, rgba) == gic.CompressType.DXBC3
    assert gic.pick_compression_type(F.ALLOW_DXBC1TO5, rgb) == gic.CompressType.DXBC1
    assert gic.pick_compression_type(F.ALLOW_DXBC6AND7, rgba) == gic.CompressType.DXBC7
    assert gic.pick_compression_type(F.ALLOW_DXBC6AND7, hdr) == gic.CompressType.DXBC6H
    assert gic.pick_compression_type(F(0), rgba) == gic.CompressType.NONE


def test_progress_callback_and_cancel():
    src = gradient_rgba(64, 64)
    seen = []
    out = gic.compress_chunked(gic.CompressType.DXBC1, _img(src),
                               progress=lambda p: seen.append(p) or False,
                               rows_per_chunk=16)
    assert out is not None
    assert seen == [25.0, 50.0, 75.0, 100.0]
    full = gic.compress(gic.CompressType.DXBC1, _img(src))
    np.testing.assert_array_equal(np.asarray(out.blocks),
                                  np.asarray(full.blocks))
    # cancellation -> None (reference contract, amd_bc1_compressor.cpp:64-68)
    cancelled = gic.compress_chunked(gic.CompressType.DXBC1, _img(src),
                                     progress=lambda p: p >= 50.0,
                                     rows_per_chunk=16)
    assert cancelled is None

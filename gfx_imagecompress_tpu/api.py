"""Public API: per-format image compressors, dispatcher, codec picker.

TPU-native analog of L4+L3 of the reference:
  - ImageCompress_Compress / ImageCompress_PickCompressionType
    (imagecompress.cpp:20-116)
  - Image_CompressAMDBC1..BC7, Image_CompressRichGel999BC7
    (amd_bc{1..7}_compressor.cpp, richgel999_bc7enc16.cpp:21-71)

The reference drivers loop blocks on the CPU; here each compressor is
image -> block tensor -> one batched jit'd encode -> packed uint32 grid.
There is no Image_CompressInit/Deinit analog: the reference's ~790 MB global
tables (imagecompress.cpp:6-18, SURVEY.md §5) do not exist in this design —
ramps are recomputed in-kernel (a few flops) and trace tables are replaced
by closed-form quantization (SURVEY.md §7 hard part 2).

Progress callbacks: encode is one device launch, so the reference's
per-row progress/cancel hook (imagecompress.h:5) maps to an optional
chunked mode — compress_chunked() fires the callback between tile batches
and honors cancellation between (not within) launches.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from .formats import BlockFormat, CompressType, PickFlags
from .image import CompressedImage, Image
from .kernels import bc1 as _bc1
from .kernels import bc4 as _bc4
from .options import (AMDBackendOptions, BC1Options, BC6HOptions, BC7Options,
                      PERCEPTUAL_WEIGHTS, RichGel999Options)
from .pipeline.blocks import image_to_blocks, packed_to_grid

ProgressFunc = Callable[[float], bool]  # returns True to cancel


def _grid(img: Image, words, wpb: int):
    return packed_to_grid(words, img.slices, img.height, img.width, wpb)


def compress_amd_bc1(src: Image,
                     amd_options: Optional[AMDBackendOptions] = None,
                     options: Optional[BC1Options] = None) -> CompressedImage:
    """Image_CompressAMDBC1 analog (amd_bc1_compressor.cpp:11-101)."""
    amd = amd_options or AMDBackendOptions()
    opt = options or BC1Options()
    blocks = image_to_blocks(src.data)
    use_alpha = opt.use_alpha and src.channels >= 4
    from .kernels.bc1_pallas import encode_bc1_blocks_pallas
    words, _ = encode_bc1_blocks_pallas(
        blocks, weights=PERCEPTUAL_WEIGHTS,
        iters=2 + amd.refinement_steps,
        b3d=amd.b3d_refinement,
        use_alpha=use_alpha,
        alpha_threshold=float(opt.alpha_threshold) / 255.0,
        adaptive=amd.adaptive_colour_weights)
    fmt = BlockFormat.BC1_SRGB if src.srgb else BlockFormat.BC1_UNORM
    return CompressedImage(_grid(src, words, 2), fmt, src.width, src.height,
                           src.slices)


def compress_amd_bc2(src: Image,
                     amd_options: Optional[AMDBackendOptions] = None
                     ) -> CompressedImage:
    """Image_CompressAMDBC2 analog: explicit 4-bit alpha + RGB block in one
    fused launch (amd_bc2_compressor.cpp:41-46)."""
    from .kernels.bc1_pallas import encode_bc2_blocks_pallas
    amd = amd_options or AMDBackendOptions()
    blocks = image_to_blocks(src.data)
    words, _ = encode_bc2_blocks_pallas(
        _rgba(blocks), weights=PERCEPTUAL_WEIGHTS,
        iters=2 + amd.refinement_steps,
        passes=2 if amd.b3d_refinement else 1,
        adaptive=amd.adaptive_colour_weights)
    fmt = BlockFormat.BC2_SRGB if src.srgb else BlockFormat.BC2_UNORM
    return CompressedImage(_grid(src, words, 4), fmt, src.width, src.height,
                           src.slices)


def compress_amd_bc3(src: Image,
                     amd_options: Optional[AMDBackendOptions] = None
                     ) -> CompressedImage:
    """Image_CompressAMDBC3 analog: interpolated alpha + RGB block in one
    fused launch (amd_bc3_compressor.cpp:41-46)."""
    from .kernels.bc1_pallas import encode_bc3_blocks_pallas
    amd = amd_options or AMDBackendOptions()
    blocks = image_to_blocks(src.data)
    words, _ = encode_bc3_blocks_pallas(
        _rgba(blocks), weights=PERCEPTUAL_WEIGHTS,
        iters=2 + amd.refinement_steps,
        passes=2 if amd.b3d_refinement else 1,
        adaptive=amd.adaptive_colour_weights)
    fmt = BlockFormat.BC3_SRGB if src.srgb else BlockFormat.BC3_UNORM
    return CompressedImage(_grid(src, words, 4), fmt, src.width, src.height,
                           src.slices)


def compress_amd_bc4(src: Image) -> CompressedImage:
    """Image_CompressAMDBC4 analog.

    NOTE: the reference samples channel 1 (G) due to a bug
    (amd_bc4_compressor.cpp:34-37, SURVEY.md §7 "bugs to not replicate");
    we sample channel 0 (R) per the BC4 format contract.
    """
    from .kernels.bc4_pallas import encode_bc4_blocks_pallas
    blocks = image_to_blocks(src.data)
    words, _ = encode_bc4_blocks_pallas(blocks[:, :, 0])
    fmt = BlockFormat.BC4_SNORM if src.signed else BlockFormat.BC4_UNORM
    return CompressedImage(_grid(src, words, 2), fmt, src.width, src.height,
                           src.slices)


def compress_amd_bc5(src: Image) -> CompressedImage:
    """Image_CompressAMDBC5 analog: channels 0,1 -> two scalar blocks in
    one fused launch (amd_bc5_compressor.cpp:35-41)."""
    from .kernels.bc4_pallas import encode_bc5_blocks_pallas
    blocks = image_to_blocks(src.data)
    words, _ = encode_bc5_blocks_pallas(blocks)
    fmt = BlockFormat.BC5_SNORM if src.signed else BlockFormat.BC5_UNORM
    return CompressedImage(_grid(src, words, 4), fmt, src.width, src.height,
                           src.slices)


def compress_amd_bc6h(src: Image,
                      amd_options: Optional[AMDBackendOptions] = None,
                      options: Optional[BC6HOptions] = None
                      ) -> CompressedImage:
    """Image_CompressAMDBC6H analog (amd_bc6h_compressor.cpp:10-90).

    The reference has an argument-order bug that drops the mode mask
    (the ctor takes it as a bool, amd_bc6h_compressor.cpp:28 /
    amd_bc6h_body.hpp:303); here the mask is honored. ``options``
    carries the BC6H-specific quality and the FULL 16-bit mode mask
    (AMDBackendOptions.mode_mask is a uint8 in the reference struct and
    cannot address BC6H modes 9-14 — it is used only when explicitly
    passed without a BC6HOptions).
    """
    from .kernels.bc6h_pallas import encode_bc6h_blocks_pallas
    if options is not None:
        quality, mask = options.quality, options.mode_mask
    elif amd_options is not None:
        quality, mask = 1.0, amd_options.mode_mask
    else:
        quality, mask = 1.0, 0xFFFF
    blocks = image_to_blocks(src.data)
    words, _ = encode_bc6h_blocks_pallas(
        blocks[:, :, :3], signed=src.signed, mode_mask=mask,
        quality=quality)
    fmt = (BlockFormat.BC6H_SFLOAT if src.signed
           else BlockFormat.BC6H_UFLOAT)
    return CompressedImage(_grid(src, words, 4), fmt, src.width, src.height,
                           src.slices)


def compress_amd_bc7(src: Image,
                     amd_options: Optional[AMDBackendOptions] = None,
                     bc7_options: Optional[BC7Options] = None
                     ) -> CompressedImage:
    """Image_CompressAMDBC7 analog (amd_bc7_compressor.cpp:25-112): full
    multi-mode search at quality 1.0 defaults."""
    from functools import partial as _partial

    from .kernels.bc7_full_pallas import encode_bc7_blocks_pallas
    from .pipeline.chunking import encode_chunked
    amd = amd_options or AMDBackendOptions()
    opt = bc7_options or BC7Options(mode_mask=amd.mode_mask)
    blocks = image_to_blocks(src.data)
    words, _ = encode_chunked(
        _partial(encode_bc7_blocks_pallas, quality=opt.quality,
                 mode_mask=opt.mode_mask,
                 colour_restrict=opt.colour_restrict,
                 alpha_restrict=opt.alpha_restrict,
                 performance=opt.performance),
        _rgba(blocks), chunk=65536)
    fmt = BlockFormat.BC7_SRGB if src.srgb else BlockFormat.BC7_UNORM
    return CompressedImage(_grid(src, words, 4), fmt, src.width, src.height,
                           src.slices)


def compress_richgel999_bc7(src: Image,
                            options: Optional[RichGel999Options] = None
                            ) -> CompressedImage:
    """Image_CompressRichGel999BC7 analog (richgel999_bc7enc16.cpp:21-71):
    fast BC7 restricted to modes 1 and 6."""
    from .kernels.bc7_fast_pallas import encode_bc7_fast_blocks_pallas
    opt = options or RichGel999Options()
    blocks = image_to_blocks(src.data)
    words, _ = encode_bc7_fast_blocks_pallas(
        _rgba(blocks), fast=opt.fast, perceptual=opt.perceptual)
    fmt = BlockFormat.BC7_SRGB if src.srgb else BlockFormat.BC7_UNORM
    return CompressedImage(_grid(src, words, 4), fmt, src.width, src.height,
                           src.slices)


def compress(ctype: CompressType, src: Image,
             fast: bool = False) -> Optional[CompressedImage]:
    """ImageCompress_Compress analog (imagecompress.cpp:20-50).

    ``fast`` selects the bc7enc16-style path for BC7. Unimplemented codecs
    (ETC/ASTC — stubs in the reference too, imagecompress.cpp:40-44) return
    None.
    """
    if ctype == CompressType.DXBC1:
        return compress_amd_bc1(src)
    if ctype == CompressType.DXBC2:
        return compress_amd_bc2(src)
    if ctype == CompressType.DXBC3:
        return compress_amd_bc3(src)
    if ctype == CompressType.DXBC4:
        return compress_amd_bc4(src)
    if ctype == CompressType.DXBC5:
        return compress_amd_bc5(src)
    if ctype == CompressType.DXBC6H:
        return compress_amd_bc6h(src)
    if ctype == CompressType.DXBC7:
        if fast:
            return compress_richgel999_bc7(src)
        return compress_amd_bc7(src)
    return None


def pick_compression_type(flags: PickFlags, src: Image) -> CompressType:
    """ImageCompress_PickCompressionType analog — pure policy
    (imagecompress.cpp:52-116): float sources -> BC6H; 1 channel -> BC4;
    2 -> BC5; RGB(A) -> BC7 if allowed, else ASTC, else BC3/BC1 by alpha."""
    if src.hdr:
        if flags & PickFlags.ALLOW_DXBC6AND7:
            return CompressType.DXBC6H
        return CompressType.NONE
    ch = src.channels
    if ch == 1:
        if flags & PickFlags.ALLOW_DXBC1TO5:
            return CompressType.DXBC4
        return CompressType.NONE
    if ch == 2:
        if flags & PickFlags.ALLOW_DXBC1TO5:
            return CompressType.DXBC5
        return CompressType.NONE
    if flags & PickFlags.ALLOW_DXBC6AND7:
        return CompressType.DXBC7
    if flags & PickFlags.ALLOW_ASTC:
        return CompressType.ASTC
    if flags & PickFlags.ALLOW_DXBC1TO5:
        if ch == 4:
            return CompressType.DXBC3
        return CompressType.DXBC1
    return CompressType.NONE


def compress_chunked(ctype: CompressType, src: Image,
                     progress: Optional[ProgressFunc] = None,
                     rows_per_chunk: int = 64,
                     fast: bool = False) -> Optional[CompressedImage]:
    """Progress-callback variant: encodes row-bands of blocks and fires
    ``progress(percent)`` between launches; returning True cancels and
    yields None (reference cancellation contract,
    amd_bc1_compressor.cpp:64-68)."""
    import numpy as np

    h = src.height
    chunks = []
    done = 0
    for y0 in range(0, h, rows_per_chunk):
        band = Image(data=src.data[:, y0:min(y0 + rows_per_chunk, h)],
                     srgb=src.srgb, signed=src.signed, hdr=src.hdr)
        out = compress(ctype, band, fast=fast)
        if out is None:
            return None
        chunks.append(out)
        done = min(y0 + rows_per_chunk, h)
        if progress is not None and progress(100.0 * done / h):
            return None
    blocks = jnp.concatenate([c.blocks for c in chunks], axis=1)
    return CompressedImage(blocks, chunks[0].format, src.width, src.height,
                           src.slices)


def _rgb_colour_words(blocks, amd: AMDBackendOptions):
    """BC2/BC3 colour block via the fused Pallas kernel (4-colour only;
    BC2/BC3 decoders force 4-colour interpolation regardless of endpoint
    order, so the mode race is disabled)."""
    from .kernels.bc1_pallas import encode_bc1_blocks_pallas
    return encode_bc1_blocks_pallas(
        blocks, weights=PERCEPTUAL_WEIGHTS,
        iters=2 + amd.refinement_steps,
        passes=2 if amd.b3d_refinement else 1,
        allow_three=False,
        adaptive=amd.adaptive_colour_weights)


def _alpha_channel(blocks):
    if blocks.shape[-1] >= 4:
        return blocks[:, :, 3]
    return jnp.ones_like(blocks[:, :, 0])


def _rgba(blocks):
    if blocks.shape[-1] >= 4:
        return blocks[:, :, :4]
    pad = jnp.ones_like(blocks[:, :, :1])
    return jnp.concatenate([blocks[:, :, :3], pad], axis=-1)

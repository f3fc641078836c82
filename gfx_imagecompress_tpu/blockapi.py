"""Lowest-level block compression API (batched).

Mirror of the reference's block entry points (imagecompress.h:103-142) —
the "real kernel surface" (SURVEY.md §1). Each function is the batched
TPU-native equivalent: instead of one 4x4 block per call, every call takes
``(N, ...)`` blocks and returns ``(N, words)`` uint32 lanes (8-byte blocks
-> 2 lanes, 16-byte -> 4 lanes). Inputs are normalized floats in [0, 1]
(imagecompress.h:104-105).
"""
from __future__ import annotations

import jax.numpy as jnp

from .kernels import bc1 as _bc1
from .kernels import bc4 as _bc4
from .options import PERCEPTUAL_WEIGHTS, UNIFORM_WEIGHTS


def compress_rgb_single_mode_blocks(rgb, adaptive_colour_weights=False,
                                    b3d_refinement=False,
                                    refinement_steps=1):
    """Image_CompressAMDRGBSingleModeBlock analog (imagecompress.h:111-115):
    (N,16,3) float RGB -> (N,2) uint32 BC2/BC3-style colour block."""
    words, _ = _bc1.encode_rgb_blocks(
        jnp.asarray(rgb), refinement_steps=refinement_steps,
        b3d_refinement=b3d_refinement,
        weights=PERCEPTUAL_WEIGHTS)
    return words


def compress_alpha_single_mode_blocks(alpha):
    """Image_CompressAMDAlphaSingleModeBlock analog (imagecompress.h:117):
    (N,16) float A -> (N,2) uint32 interpolated-alpha block."""
    words, _ = _bc4.encode_bc4_blocks(jnp.asarray(alpha))
    return words


def compress_explicit_alpha_blocks(alpha):
    """Image_CompressAMDExplictAlphaSingleModeBlock analog
    (imagecompress.h:119): (N,16) float A -> (N,2) uint32 4-bit alpha."""
    words, _ = _bc4.encode_bc2_alpha_blocks(jnp.asarray(alpha))
    return words


def compress_bc1_blocks(rgba, adaptive_colour_weights=False,
                        b3d_refinement=False, refinement_steps=1,
                        alpha_threshold=0.0):
    """Image_CompressAMDBC1Block analog (imagecompress.h:122-127):
    (N,16,4) float RGBA -> (N,2) uint32 BC1 block; threshold in 0..1,
    <= 0 disables punch-through."""
    words, _ = _bc1.encode_bc1_blocks(
        jnp.asarray(rgba), alpha_threshold=max(alpha_threshold, 0.0),
        use_alpha=alpha_threshold > 0.0,
        refinement_steps=refinement_steps, b3d_refinement=b3d_refinement,
        weights=PERCEPTUAL_WEIGHTS)
    return words


def compress_multi_mode_ldr_blocks(rgba, mode_mask=0xFF, src_has_alpha=True,
                                   quality=1.0, colour_restrict=True,
                                   alpha_restrict=True, performance=1.0):
    """Image_CompressAMDMultiModeLDRBlock analog (imagecompress.h:129-136):
    (N,16,4) float RGBA -> (N,4) uint32 BC7 block (full mode search)."""
    from .kernels.bc7_full import encode_bc7_blocks
    words, _ = encode_bc7_blocks(
        jnp.asarray(rgba), quality=quality, mode_mask=mode_mask,
        src_has_alpha=src_has_alpha, colour_restrict=colour_restrict,
        alpha_restrict=alpha_restrict, performance=performance)
    return words


def compress_richgel999_bc7enc16_blocks(rgba8, fast=False, perceptual=True):
    """Image_CompressRichGel999BC7enc16 analog (imagecompress.h:139-142):
    (N,16) uint32 packed RGBA8 -> (N,4) uint32 BC7 block (modes 1/6)."""
    from .kernels.bc7_fast import encode_bc7_fast_blocks
    v = jnp.asarray(rgba8, jnp.uint32)
    rgba = jnp.stack([(v >> 0) & 0xFF, (v >> 8) & 0xFF,
                      (v >> 16) & 0xFF, (v >> 24) & 0xFF],
                     axis=-1).astype(jnp.float32) / 255.0
    words, _ = encode_bc7_fast_blocks(rgba, fast=fast, perceptual=perceptual)
    return words

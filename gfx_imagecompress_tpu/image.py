"""Image container.

TPU-native analog of gfx_image's ``Image_ImageHeader`` (L0 foundation in the
reference, SURVEY.md §1): a thin pytree wrapping a JAX array plus format
metadata. Pixel data is kept as a dense ``(slices, H, W, C)`` array; LDR data
is normalized float32 in [0, 1] (matching the reference block API contract,
imagecompress.h:104-105), HDR data is float32 interpreted as half-precision
range.

Compressed images store the packed block stream as ``(slices, BY, BX, W32)``
uint32 lanes plus the logical (pre-rounding) dimensions — the reference
rounds stored dims up to block multiples (tests/test_imagecompress.cpp:146-165
asserts 257→260); we keep both.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .formats import BlockFormat, BLOCK_FORMAT_INFO, block_count


@dataclass(frozen=True)
class Image:
    """Uncompressed image: data (slices, H, W, C) float32."""

    data: Any  # jnp.ndarray (S, H, W, C) float32
    srgb: bool = False
    signed: bool = False  # SNORM / signed half source
    hdr: bool = False     # float source (BC6H-eligible)

    @property
    def slices(self) -> int:
        return self.data.shape[0]

    @property
    def height(self) -> int:
        return self.data.shape[1]

    @property
    def width(self) -> int:
        return self.data.shape[2]

    @property
    def channels(self) -> int:
        return self.data.shape[3]

    @staticmethod
    def from_array(arr, srgb: bool = False, signed: bool = False,
                   hdr: bool = False) -> "Image":
        """Accepts (H,W,C), (S,H,W,C); uint8 arrays are normalized to [0,1]."""
        a = jnp.asarray(arr)
        if a.ndim == 3:
            a = a[None]
        if a.ndim != 4:
            raise ValueError(f"expected (H,W,C) or (S,H,W,C), got {a.shape}")
        if a.dtype == jnp.uint8:
            a = a.astype(jnp.float32) / 255.0
        elif a.dtype != jnp.float32:
            a = a.astype(jnp.float32)
        return Image(data=a, srgb=srgb, signed=signed, hdr=hdr)


@dataclass(frozen=True)
class CompressedImage:
    """Block-compressed image.

    ``blocks``: (S, BY, BX, W) uint32 — W = 2 for 8-byte formats, 4 for
    16-byte formats, little-endian lane order (word 0 = lowest 4 bytes of the
    128/64-bit block, matching the reference's uint32* writes,
    amd_bcx_helpers.cpp:98-104).
    """

    blocks: Any
    format: BlockFormat
    width: int   # logical source width (pre round-up)
    height: int
    slices: int = 1

    @property
    def stored_width(self) -> int:
        """Reference stores dims rounded up to block multiples (bc1:33-35)."""
        return block_count(self.width) * 4

    @property
    def stored_height(self) -> int:
        return block_count(self.height) * 4

    @property
    def blocks_x(self) -> int:
        return block_count(self.width)

    @property
    def blocks_y(self) -> int:
        return block_count(self.height)

    def tobytes(self) -> bytes:
        """Serialize the block stream in DDS scan order (little-endian)."""
        arr = np.asarray(jax.device_get(self.blocks)).astype("<u4")
        return arr.tobytes()

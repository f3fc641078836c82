"""Bit-exact BC1-BC5 block decoders (batched, integer math only).

The reference ships NO decoder (its tests assert only metadata,
tests/test_imagecompress.cpp — SURVEY.md §4); these decoders are the
round-trip oracle the TPU framework adds. All arithmetic is int32 so results
are bit-exact and platform-independent (SURVEY.md §7 hard part 5).

Decode conventions (documented because BC1/BC4 interpolation precision is
implementation-defined within D3D tolerances; BC7/BC6H are exactly specified
and live in decode/bc7.py / decode/bc6h.py):
  - 565 endpoint expansion by bit replication: r8 = (r5<<3)|(r5>>2),
    g8 = (g6<<2)|(g6>>4) — same as the reference's clusterizer expansion
    (amd_bcx_body.cpp:157-181 MkWkRmpPts).
  - BC1 thirds are rounded to nearest: p2 = (2*a + b + 1) // 3.
  - BC4 sevenths/fifths rounded to nearest: (x*a0 + y*a1 + 3) // 7,
    (x*a0 + y*a1 + 2) // 5.
The encoders use the *same* integer palettes for their error models, so
encode-side error == decode-side error exactly.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import bitpack

I32 = jnp.int32


def expand_565(c: jnp.ndarray):
    """(N,) uint32 565 -> three (N,) int32 8-bit channels (r, g, b)."""
    c = c.astype(I32)
    r5 = (c >> 11) & 0x1F
    g6 = (c >> 5) & 0x3F
    b5 = c & 0x1F
    r = (r5 << 3) | (r5 >> 2)
    g = (g6 << 2) | (g6 >> 4)
    b = (b5 << 3) | (b5 >> 2)
    return r, g, b


def bc1_palette(c0: jnp.ndarray, c1: jnp.ndarray, force_four: bool):
    """Build (N, 4, 4) RGBA int32 palettes from 565 endpoint words.

    ``force_four``: BC2/BC3 colour blocks always decode in 4-colour mode
    regardless of endpoint order (D3D spec); plain BC1 uses c0 > c1 to select
    4-colour vs 3-colour + transparent.
    """
    r0, g0, b0 = expand_565(c0)
    r1, g1, b1 = expand_565(c1)
    e0 = jnp.stack([r0, g0, b0], axis=-1)  # (N, 3)
    e1 = jnp.stack([r1, g1, b1], axis=-1)
    p2_4 = (2 * e0 + e1 + 1) // 3
    p3_4 = (e0 + 2 * e1 + 1) // 3
    p2_3 = (e0 + e1 + 1) // 2
    p3_3 = jnp.zeros_like(e0)
    four = force_four | (c0.astype(I32) > c1.astype(I32))
    four = four[:, None]
    p2 = jnp.where(four, p2_4, p2_3)
    p3 = jnp.where(four, p3_4, p3_3)
    rgb = jnp.stack([e0, e1, p2, p3], axis=1)          # (N, 4, 3)
    alpha = jnp.where(
        four, jnp.array([255, 255, 255, 255], I32)[None, :],
        jnp.array([255, 255, 255, 0], I32)[None, :])    # (N, 4)
    return jnp.concatenate([rgb, alpha[:, :, None]], axis=-1)


def decode_bc1(words: jnp.ndarray, force_four: bool = False) -> jnp.ndarray:
    """(N, 2) uint32 -> (N, 16, 4) int32 RGBA in [0, 255]."""
    c0 = bitpack.extract(words, 0, 16)
    c1 = bitpack.extract(words, 16, 16)
    pal = bc1_palette(c0, c1, force_four)               # (N, 4, 4)
    idx = bitpack.extract_indices(words, 32, 2)          # (N, 16)
    return jnp.take_along_axis(pal, idx[:, :, None], axis=1)


def bc4_palette(a0: jnp.ndarray, a1: jnp.ndarray) -> jnp.ndarray:
    """(N,) endpoint bytes -> (N, 8) int32 interpolated alpha palette."""
    a0 = a0.astype(I32)
    a1 = a1.astype(I32)
    eight = a0 > a1
    pal = [a0, a1]
    for i in range(2, 8):
        w1 = i - 1
        p8 = ((8 - i) * a0 + w1 * a1 + 3) // 7
        if i < 6:
            p6 = ((6 - i) * a0 + w1 * a1 + 2) // 5
        else:
            p6 = jnp.full_like(a0, 0 if i == 6 else 255)
        pal.append(jnp.where(eight, p8, p6))
    return jnp.stack(pal, axis=1)


def decode_bc4_block(words: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) uint32 alpha block -> (N, 16) int32 in [0, 255]."""
    a0 = bitpack.extract(words, 0, 8)
    a1 = bitpack.extract(words, 8, 8)
    pal = bc4_palette(a0, a1)                            # (N, 8)
    idx = bitpack.extract_indices(words, 16, 3)          # (N, 16)
    return jnp.take_along_axis(pal, idx, axis=1)


def decode_bc2_alpha(words: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) uint32 explicit-alpha block -> (N, 16) int32 in [0, 255]."""
    idx = bitpack.extract_indices(words, 0, 4)           # (N, 16) 4-bit
    return idx * 17  # 4-bit -> 8-bit by replication (x * 0x11)


def decode_bc2(words: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) uint32 -> (N, 16, 4) int32 RGBA."""
    a = decode_bc2_alpha(words[:, 0:2])
    rgba = decode_bc1(words[:, 2:4], force_four=True)
    return rgba.at[:, :, 3].set(a)


def decode_bc3(words: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) uint32 -> (N, 16, 4) int32 RGBA."""
    a = decode_bc4_block(words[:, 0:2])
    rgba = decode_bc1(words[:, 2:4], force_four=True)
    return rgba.at[:, :, 3].set(a)


def decode_bc4(words: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) uint32 -> (N, 16, 1) int32."""
    return decode_bc4_block(words)[:, :, None]


def decode_bc5(words: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) uint32 -> (N, 16, 2) int32 (R block then G block, bc5:35-41)."""
    r = decode_bc4_block(words[:, 0:2])
    g = decode_bc4_block(words[:, 2:4])
    return jnp.stack([r, g], axis=-1)

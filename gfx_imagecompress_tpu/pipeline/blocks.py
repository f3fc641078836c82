"""Image <-> block-tensor layout.

TPU-native replacement for the reference's per-block gather/scatter loop
(block_utils.cpp:7-160 ``ReadNxNBlock*``/``WriteNxNBlock`` called from the
L3 driver triple loop, amd_bc1_compressor.cpp:44-70). Instead of a scalar
loop we do ONE edge-clamp pad + reshape/transpose producing a dense
``(N, 16, C)`` block tensor that every encoder consumes batched. Edge-clamp
replication for non-multiple-of-4 images matches ReadNxNBlockF's
``Math_ClampI(...)`` gather semantics (block_utils.cpp:17-24): clamping the
sample coordinate to the last row/column is exactly an edge-mode pad.

The block axis N = S*BY*BX is the framework's parallel axis — vmap/Pallas
batches it on-chip, shard_map shards it across chips (halo-free: blocks
never read neighbours; SURVEY.md §2 parallelism inventory).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..formats import block_count


def pad_to_blocks(img: jnp.ndarray) -> jnp.ndarray:
    """Edge-clamp pad (S,H,W,C) so H and W are multiples of 4."""
    s, h, w, c = img.shape
    ph = block_count(h) * 4 - h
    pw = block_count(w) * 4 - w
    if ph == 0 and pw == 0:
        return img
    return jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")


def image_to_blocks(img: jnp.ndarray) -> jnp.ndarray:
    """(S, H, W, C) -> (N, 16, C) with N = S*BY*BX, raster block order.

    Pixel order within a block is row-major (y*4+x), matching the reference
    block layout (block_utils.cpp:17-24: ``block[(y * blockWidth) + x]``).
    """
    img = pad_to_blocks(img)
    s, h, w, c = img.shape
    by, bx = h // 4, w // 4
    t = img.reshape(s, by, 4, bx, 4, c)
    t = t.transpose(0, 1, 3, 2, 4, 5)        # (S, BY, BX, 4, 4, C)
    return t.reshape(s * by * bx, 16, c)


def blocks_to_image(blocks: jnp.ndarray, slices: int, height: int,
                    width: int) -> jnp.ndarray:
    """(N, 16, C) -> (S, H, W, C), cropping any block-padding rows/cols."""
    n, _, c = blocks.shape
    by, bx = block_count(height), block_count(width)
    t = blocks.reshape(slices, by, bx, 4, 4, c)
    t = t.transpose(0, 1, 3, 2, 4, 5)        # (S, BY, 4, BX, 4, C)
    t = t.reshape(slices, by * 4, bx * 4, c)
    return t[:, :height, :width, :]


def packed_to_grid(words: jnp.ndarray, slices: int, height: int, width: int,
                   words_per_block: int) -> jnp.ndarray:
    """(N, W) uint32 packed blocks -> (S, BY, BX, W) storage grid."""
    by, bx = block_count(height), block_count(width)
    return words.reshape(slices, by, bx, words_per_block)


def grid_to_packed(grid: jnp.ndarray) -> jnp.ndarray:
    """(S, BY, BX, W) -> (N, W)."""
    s, by, bx, w = grid.shape
    return grid.reshape(s * by * bx, w)

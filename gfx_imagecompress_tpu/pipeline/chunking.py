"""Block-axis chunking for memory-heavy encoders.

The full BC7 search materializes (chunk, 64-partitions, 16, C) intermediates;
chunking the block axis bounds peak memory for arbitrarily large images and
keeps a single compiled program (the last slab is padded to the chunk size,
avoiding shape-polymorphic recompiles)."""
from __future__ import annotations

import jax.numpy as jnp


def encode_chunked(encode_fn, blocks: jnp.ndarray, chunk: int = 4096):
    """Apply ``encode_fn(blocks_chunk) -> (words, err)`` over slabs.

    Pads the final slab with copies of block 0 and trims the outputs.
    """
    n = blocks.shape[0]
    if n <= chunk:
        return encode_fn(blocks)
    words_l, err_l = [], []
    for i in range(0, n, chunk):
        slab = blocks[i:i + chunk]
        if slab.shape[0] < chunk:
            pad = jnp.broadcast_to(slab[:1],
                                   (chunk - slab.shape[0],) + slab.shape[1:])
            padded = jnp.concatenate([slab, pad], axis=0)
            w, e = encode_fn(padded)
            w = w[:slab.shape[0]]
            e = e[:slab.shape[0]]
        else:
            w, e = encode_fn(slab)
        words_l.append(w)
        err_l.append(e)
    return jnp.concatenate(words_l, axis=0), jnp.concatenate(err_l, axis=0)

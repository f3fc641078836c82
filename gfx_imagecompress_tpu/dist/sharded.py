"""Multi-chip sharded encoding.

The reference is single-threaded (SURVEY.md §2 parallelism inventory: its
only concurrency structure is the per-block independence of the L3 loop).
Here that independence becomes the distribution axis: blocks never read
neighbours (edge clamp is intra-block, block_utils.cpp:7-41), so sharding
the block axis across a `jax.sharding.Mesh` needs **zero communication**
during encode — collectives appear only to (a) all-gather the packed words
for host assembly and (b) psum per-image squared error into a global MSE.
Shardings ride ICI within a slice; on multi-host pods the same code runs
under `jax.distributed` with DCN crossing only at the final gather
(SURVEY.md §5 "distributed communication backend").
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "b") -> Mesh:
    """1-D data mesh over the block axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis_name,))


def pad_to_multiple(blocks: jnp.ndarray, mult: int):
    """Pad the block axis to a multiple of the mesh size (replicating block 0
    keeps every lane's content valid); returns (padded, original_n)."""
    n = blocks.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return blocks, n
    pad = jnp.broadcast_to(blocks[:1], (rem,) + blocks.shape[1:])
    return jnp.concatenate([blocks, pad], axis=0), n


def shard_encode(encode_fn: Callable, blocks: jnp.ndarray, mesh: Mesh,
                 axis_name: str = "b"):
    """Run a batched block encoder sharded over the mesh.

    ``encode_fn(blocks) -> (words, err)`` is any kernel from kernels/.
    Returns (words (N,W), err (N,), mse_scalar) with words/err sharded and
    ``mse_scalar`` the psum-reduced global mean squared error — the metric
    the reference computes per block and discards (SURVEY.md §5).
    """
    nd = mesh.devices.size
    padded, n = pad_to_multiple(blocks, nd)
    sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    padded = jax.device_put(padded, sharding)

    @partial(jax.jit, out_shardings=(sharding, sharding, replicated))
    def run(x):
        words, err = encode_fn(x)
        # psum across the sharded axis: XLA lowers this jnp.sum over a
        # sharded operand to an AllReduce over ICI
        total = jnp.sum(err)
        return words, err, total

    words, err, total = run(padded)
    mse = total / (blocks.shape[0] * blocks.shape[1])
    return words[:n], err[:n], mse


def shard_encode_pallas(encode_fn: Callable, blocks: jnp.ndarray, mesh: Mesh,
                        axis_name: str = "b"):
    """shard_map a fused Pallas encoder: each device runs its own kernel on
    its block shard (no communication — blocks are independent), errors
    psum to a replicated scalar. Bit-identical to the single-device kernel.
    """
    from jax.sharding import PartitionSpec

    nd = mesh.devices.size
    padded, n = pad_to_multiple(blocks, nd)
    sharding = NamedSharding(mesh, P(axis_name))
    padded = jax.device_put(padded, sharding)
    p = PartitionSpec(axis_name)

    local = jax.shard_map(encode_fn, mesh=mesh, in_specs=p,
                          out_specs=(p, p), check_vma=False)

    @jax.jit
    def run(x):
        words, err = local(x)
        return words, err, jnp.sum(err)

    words, err, total = run(padded)
    mse = total / (blocks.shape[0] * blocks.shape[1])
    return words[:n], err[:n], mse


def gather_words(words: jnp.ndarray) -> np.ndarray:
    """All-gather the packed block stream to the host (deterministic
    block->shard mapping means assembly is a plain reshape, SURVEY.md §5)."""
    return np.asarray(jax.device_get(words))


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` for a multi-host pod slice.

    Reads the standard cluster env (or the explicit arguments) and calls
    ``jax.distributed.initialize`` so that ``jax.devices()`` spans the full
    slice and the DCN-crossing collectives of shard_encode* become legal.
    Safe no-op returning False when the environment is single-process —
    the same code path then runs ICI-only on the local chips (SURVEY.md §5
    "distributed communication backend").
    """
    import os
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if (num_processes is None or num_processes <= 1) \
            and coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def gather_words_global(words: jnp.ndarray) -> np.ndarray:
    """Host-0-complete gather of a sharded word stream.

    Single-process: a device_get. Multi-host (after init_multihost): a
    ``process_allgather`` over DCN so every host — in particular host 0,
    which writes the DDS — holds the full stream. The block->shard mapping
    is deterministic (pad + equal split), so assembly stays a reshape.
    """
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(words))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(words, tiled=True))

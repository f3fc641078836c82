"""Worker process for test_multihost: one 'host' of a 2-process cluster.

Usage: python _multihost_worker.py <coordinator_port> <process_id> <out_file>

Each worker owns 4 virtual CPU devices; together they form the 8-device
cluster the single-process tests emulate. This exercises the REAL
``jax.distributed`` path (coordination service + cross-process collectives)
that a multi-host TPU pod uses, with CPU standing in for the chips — the
executable version of dist/sharded.py's multi-host claim (SURVEY.md §5
"distributed communication backend").
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4"
                           ).strip()
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, out_file = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gfx_imagecompress_tpu.dist import sharded
    from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks

    ok = sharded.init_multihost(coordinator_address=f"localhost:{port}",
                                num_processes=2, process_id=pid)
    assert ok, "init_multihost returned False for an explicit cluster"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    # Deterministic global input: every process constructs the same 64
    # blocks; each contributes its local half to the global sharded array.
    rng = np.random.default_rng(7)
    glob = rng.random((64, 16, 4), dtype=np.float32)
    mesh = sharded.make_mesh()                     # all 8 global devices
    sharding = NamedSharding(mesh, P("b"))
    local = glob[pid * 32:(pid + 1) * 32]
    arr = jax.make_array_from_process_local_data(sharding, local)

    words, err, mse = sharded.shard_encode(encode_bc1_blocks, arr, mesh)
    full = sharded.gather_words_global(words)      # DCN-analog allgather

    np.savez(out_file, words=np.asarray(full), mse=float(mse))
    print(f"proc {pid}: gathered {full.shape}, mse={float(mse):.4f}",
          flush=True)


if __name__ == "__main__":
    main()

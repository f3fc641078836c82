"""Executable multi-host path: 2 ``jax.distributed`` processes on CPU.

The reference has no distribution at all; BASELINE's scaling target is a
multi-host v5e pod. Real pod hardware isn't available in CI, so this test
runs the genuine multi-process machinery (coordination service, global
mesh spanning processes, cross-process allgather in
``gather_words_global``) with virtual CPU devices standing in for chips —
the strongest claim about dist/sharded.py that is executable here.
"""
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_encodes_and_gathers():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # share the persistent compile cache so warm runs stay fast
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"w{i}.npz") for i in range(2)]
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(i), outs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=540)
            logs.append(out.decode(errors="replace"))
        for p, log in zip(procs, logs):
            assert p.returncode == 0, log[-2000:]

        a = np.load(outs[0])
        b = np.load(outs[1])
        # both hosts hold the identical full stream (host 0 writes the DDS)
        np.testing.assert_array_equal(a["words"], b["words"])
        assert a["words"].shape == (64, 2)
        assert abs(float(a["mse"]) - float(b["mse"])) < 1e-9

        # the cluster result matches a plain single-process encode
        import jax.numpy as jnp
        from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks
        rng = np.random.default_rng(7)
        glob = rng.random((64, 16, 4), dtype=np.float32)
        w1, _ = encode_bc1_blocks(jnp.asarray(glob))
        np.testing.assert_array_equal(a["words"], np.asarray(w1))

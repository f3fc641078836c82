"""Test configuration: run on a virtual 8-device CPU mesh.

Must set XLA flags before the first jax import (SURVEY.md §4: multi-chip
tests run the tile-sharding path on a CPU mesh without real TPUs).
"""
import os

# Force CPU even when the session env points JAX at the TPU tunnel
# (JAX_PLATFORMS=axon): unit tests must be hermetic and run the sharding
# path on 8 virtual CPU devices. The tunnel's sitecustomize imports jax at
# interpreter start, so env vars are read before this file runs — the
# platform override must go through jax.config (still honoured because no
# backend has been *initialized* yet), while XLA_FLAGS is read lazily at
# CPU-client creation and can still be set here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent on-disk compilation cache: the suite's cost is almost entirely
# XLA-CPU compiles of interpret-mode Pallas search graphs (~73 min serial,
# measured per-module), so warm reruns drop to minutes. The cache survives
# jax.clear_caches() (which only drops in-memory executables) and is keyed
# by HLO, so kernel edits miss cleanly. The cpu_aot_loader "machine feature
# +prefer-no-scatter" warnings this triggers are LLVM tuning hints, not ISA
# requirements — execution is unaffected.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy XLA-CPU compile; skipped unless RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    """Default run stays under the wall-clock budget (VERDICT r1 item 7):
    tests that compile the max-quality search graphs are opt-in via
    RUN_SLOW=1 — their search machinery is still covered at reduced budgets
    by the default tests and at full budgets by bench_quality."""
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow compile; set RUN_SLOW=1 to run")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop compiled executables between modules.

    The suite compiles dozens of very large XLA CPU programs (interpret-mode
    Pallas kernels); letting them accumulate in one process has produced
    segfaults inside backend_compile_and_load late in the run."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---- procedural fixtures mirroring the reference test patterns
# (tests/test_imagecompress.cpp:14-126) ----

def solid_image(h, w, rgba):
    img = np.zeros((h, w, 4), np.float32)
    img[:] = np.asarray(rgba, np.float32)
    return img


def gradient_rgba(h, w):
    """Alpha-gradient RGBA pattern (test_imagecompress.cpp:88-106 analog)."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), np.float32)
    img[..., 0] = x / max(w - 1, 1)
    img[..., 1] = y / max(h - 1, 1)
    img[..., 2] = (x + y) / max(h + w - 2, 1)
    img[..., 3] = x / max(w - 1, 1)
    return img


def checker_rgb(h, w):
    """RGB checker pattern (test_imagecompress.cpp:50-66 analog)."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), np.float32)
    img[..., 0] = ((x // 4 + y // 4) % 2).astype(np.float32)
    img[..., 1] = ((x // 8 + y // 8) % 2).astype(np.float32)
    img[..., 2] = ((x // 2 + y // 2) % 2).astype(np.float32)
    img[..., 3] = 1.0
    return img


def punch_through(h, w):
    """Checker with alpha 0/1 squares (test_imagecompress.cpp:68-86 analog)."""
    img = checker_rgb(h, w)
    y, x = np.mgrid[0:h, 0:w]
    img[..., 3] = ((x // 4 + y // 4) % 2).astype(np.float32)
    return img


def noise_rgba(h, w, seed=0):
    r = np.random.default_rng(seed)
    return r.random((h, w, 4), dtype=np.float32)


def photo_rgba(h, w, seed=0, noise=0.015):
    """Photo-like content: smooth multi-frequency fields + mild noise.

    Uniform random noise is a worst case no BCn codec handles well (a 4x4
    noise block has no low-rank structure); quality thresholds in tests use
    this fixture instead."""
    r = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        np.sin(x * 0.21 + y * 0.07) * 0.4 + 0.5,
        np.sin(x * 0.05 + 1.0) * np.cos(y * 0.11) * 0.35 + 0.5,
        np.sin((x + y) * 0.13 + 2.0) * 0.3 + 0.45,
        np.ones_like(x)], axis=-1)
    img[..., :3] += r.normal(0, noise, (h, w, 3)).astype(np.float32)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def psnr(a, b, peak=255.0):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(peak * peak / mse)

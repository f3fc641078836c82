"""CI-style quality gate: framework PSNR >= reference algorithm PSNR.

The full 13-config matrix (quality_results.json) runs via
``python -m gfx_imagecompress_tpu.bench_quality``; its reference side is
cached in refcpu/baseline_cache.json. This test asserts the gate on the
rows whose framework side is cheap to encode (the max-quality BC7/BC6H
rows compile for ~10 min each on XLA-CPU and run under RUN_SLOW=1).

Gate semantics match BASELINE's north star: fw PSNR >= ref PSNR per
config, with a -0.05 dB measurement-noise allowance (the worst full-matrix
row to date is bc7_full_q1 at -0.031 dB; see ROADMAP.md).
"""
import os

import pytest

from gfx_imagecompress_tpu.bench_quality import run

CHEAP = ["bc1", "bc1_punch", "bc4", "bc2", "bc3", "bc7_fast", "bc7_fastest"]
HEAVY = ["bc7_full_q1", "bc7_full_q0.6", "bc7_full_q0.3",
         "bc7_full_alpha", "bc6h_uf", "bc6h_sf"]

TOL_DB = -0.05


def _assert_rows(only):
    results = run(only=only)
    assert len(results) == len(only), [r["config"] for r in results]
    for r in results:
        assert r["delta_db"] >= TOL_DB, (
            f"{r['config']}: fw {r['fw_psnr']} vs ref {r['ref_psnr']} "
            f"(delta {r['delta_db']} dB)")


def test_quality_gate_cheap_rows():
    _assert_rows(CHEAP)


def test_quality_gate_cheap_rows_pallas():
    """Same gate on the SHIPPING path — the fused Pallas kernels api.py
    dispatches (interpret mode on CPU). Guards the Pallas quality matrix
    against silent drift between manual regenerations (VERDICT r4 item 8);
    full budgets, so a kernel edit that regresses quality fails here."""
    results = run(only=CHEAP, pallas=True)
    assert len(results) == len(CHEAP), [r["config"] for r in results]
    for r in results:
        assert r["delta_db"] >= TOL_DB, (
            f"{r['config']} (pallas): fw {r['fw_psnr']} vs ref "
            f"{r['ref_psnr']} (delta {r['delta_db']} dB)")


@pytest.mark.slow
def test_quality_gate_full_matrix():
    _assert_rows(CHEAP + HEAVY)

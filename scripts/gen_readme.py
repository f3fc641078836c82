"""Regenerate README's perf + quality sections from the measured artifacts.

VERDICT r4 item 3: README numbers must equal the committed artifacts BY
CONSTRUCTION. This script renders:

  - the performance table from bench_results.json (+ MFU fields when
    present), between  <!-- BEGIN GENERATED: perf -->  markers;
  - the quality summary from quality_results.json and
    quality_results_pallas.json, between  <!-- BEGIN GENERATED: quality -->
    markers.

Run after bench.py / bench_quality.py and commit the result:
    python scripts/gen_readme.py
"""
import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _fmt_rate(v):
    if v >= 1000:
        return f"**{v / 1000:.2f} Gtexel/s**"
    return f"{v:.0f} Mtexel/s"


_PERF_ROWS = [
    # (results key, label, notes)
    ("bc1_256_mtexels_per_s", "BC1 (256², ×64 batch)",
     "fused Pallas kernel incl. punch-through alpha; ≥1 Gtexel/s target"),
    ("bc2_1k_mtexels_per_s", "BC2 (1K)",
     "fused colour + explicit 4-bit alpha, single launch"),
    ("bc3_1k_mtexels_per_s", "BC3 (1K)",
     "fused colour + interpolated alpha, single launch"),
    ("bc4_512_mtexels_per_s", "BC4 (512²)", "scalar-ramp Pallas kernel"),
    ("bc5_512_mtexels_per_s", "BC5 (512²)", "two fused scalar channels"),
    ("bc6h_1k_ufloat_mtexels_per_s", "BC6H unsigned (1K HDR)",
     "14-mode sweep + winner shake"),
    ("bc6h_1k_snorm_mtexels_per_s", "BC6H signed (1K HDR)", "same, signed"),
    ("bc7_fast_1k_mtexels_per_s", "BC7 fast (1K, modes 1+6)",
     "bc7enc16-analog search + uber machinery"),
    ("bc7_full_2k_mtexels_per_s", "BC7 full (2K, max quality)",
     "8-mode/64-partition search, shake + uber refinement"),
]


def perf_section(bench, mfu):
    dev = bench.get("device", "TPU")
    lines = [
        f"Measured on `{dev}` by `bench.py` (marginal device time of an",
        "on-device `fori_loop`; every output word is reduced so XLA cannot",
        "dead-code-eliminate any kernel). Regenerate this table with",
        "`python scripts/gen_readme.py` after a bench run.",
        "",
    ]
    have_mfu = any(k + "_vpu_util" in bench for k, _, _ in _PERF_ROWS)
    hdr = "| Codec | Throughput | VPU util | Notes |" if have_mfu else \
          "| Codec | Throughput | Notes |"
    sep = "|---|---|---|---|" if have_mfu else "|---|---|---|"
    lines += [hdr, sep]
    for key, label, note in _PERF_ROWS:
        if key not in bench:
            continue
        v = bench[key]
        if have_mfu:
            u = bench.get(key + "_vpu_util")
            ustr = f"{u * 100:.0f}%" if u is not None else "—"
            lines.append(f"| {label} | {_fmt_rate(v)} | {ustr} | {note} |")
        else:
            lines.append(f"| {label} | {_fmt_rate(v)} | {note} |")
    if have_mfu:
        lines += [
            "",
            "\"VPU util\" is modeled kernel flops (XLA cost analysis of the",
            "jnp twin kernels, `flops_model.json`) against the ~6 TFLOP/s",
            "fp32 vector-unit ceiling of a v5e chip — these encoders run",
            "integer/float candidate searches on the VPU, not MXU matmuls.",
            "See `PERF.md` for the full roofline discussion.",
        ]
    return "\n".join(lines)


def quality_section(q_xla, q_pallas):
    def stats(rows):
        worst = min(rows, key=lambda r: r["delta_db"])
        ahead = sum(1 for r in rows if r["delta_db"] > 0)
        return worst, ahead, len(rows)

    wx, ax_, nx = stats(q_xla)
    wp, ap_, np_ = stats(q_pallas)
    sf = next((r for r in q_xla if r["config"] == "bc6h_sf"), None)
    all_ok = all(r["ok"] for r in q_xla + q_pallas)
    lines = [
        "`refcpu/` holds reference-faithful CPU reimplementations of the",
        "reference's actual searches (AMD BC7 trace/AnD quantizer + endpoint",
        "shakers, BCX, BC6H, bc7enc16); `bench_quality.py` races this",
        "framework against them on a deterministic natural-image-statistics",
        "corpus (Kodak stand-in — this environment has no network egress, so",
        "the real Kodak set cannot be fetched; wire real assets in if you",
        "have them), both sides decoded by the independent C++ oracle.",
        "",
        f"- XLA path (`quality_results.json`): {nx} configs, "
        f"{'all pass' if all_ok else 'FAILURES'}; ahead on {ax_}/{nx} rows; "
        f"worst delta {wx['delta_db']:+.3f} dB ({wx['config']}).",
        f"- Pallas path — the kernels `api.py` ships "
        f"(`quality_results_pallas.json`): {np_} configs; ahead on "
        f"{ap_}/{np_} rows; worst delta {wp['delta_db']:+.3f} dB "
        f"({wp['config']}).",
    ]
    if sf:
        lines += [
            f"- Honesty note: the bc6h_sf {sf['delta_db']:+.1f} dB headline "
            "margin is mostly the *reference* losing ~5 dB to its own "
            "signed-path defects (sign-magnitude work values + signed "
            "quantize, reproduced faithfully in `refcpu/bc6h_amd.py`), not "
            "TPU magic; this framework's signed path costs ~0.1 dB vs "
            "unsigned.",
        ]
    return "\n".join(lines)


def replace_section(text, name, body):
    begin = f"<!-- BEGIN GENERATED: {name} -->"
    end = f"<!-- END GENERATED: {name} -->"
    pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.S)
    block = f"{begin}\n{body}\n{end}"
    if not pat.search(text):
        raise SystemExit(f"README missing markers for section '{name}'")
    return pat.sub(block, text)


def main():
    with open(os.path.join(ROOT, "bench_results.json")) as f:
        bench = json.load(f)
    with open(os.path.join(ROOT, "quality_results.json")) as f:
        q_xla = json.load(f)
    with open(os.path.join(ROOT, "quality_results_pallas.json")) as f:
        q_pal = json.load(f)
    mfu = None
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        text = f.read()
    text = replace_section(text, "perf", perf_section(bench, mfu))
    text = replace_section(text, "quality", quality_section(q_xla, q_pal))
    with open(path, "w") as f:
        f.write(text)
    print("README.md regenerated from artifacts")


if __name__ == "__main__":
    main()

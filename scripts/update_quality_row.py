"""Re-measure specific quality-matrix rows and merge them into the
committed artifact (quality_results.json / quality_results_pallas.json).

``bench_quality --only`` deliberately does not write the artifacts (a
partial run must not clobber the matrix); after a kernel change that
affects a known subset of rows, this runs just those rows and splices the
fresh results in, keeping the rest of the matrix intact.

    python scripts/update_quality_row.py [--pallas] row [row ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    args = [a for a in sys.argv[1:] if a != "--pallas"]
    pallas = "--pallas" in sys.argv
    if not args:
        sys.exit("usage: update_quality_row.py [--pallas] row [row ...]")
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from gfx_imagecompress_tpu.bench_quality import run
    results = run(only=args, pallas=pallas)
    path = "quality_results_pallas.json" if pallas else "quality_results.json"
    with open(path) as f:
        matrix = json.load(f)
    by_name = {r["config"]: r for r in results}
    for i, row in enumerate(matrix):
        if row["config"] in by_name:
            matrix[i] = by_name.pop(row["config"])
    matrix.extend(by_name.values())
    with open(path, "w") as f:
        json.dump(matrix, f, indent=1)
    print(f"updated {path}: {[r['config'] for r in results]}")


if __name__ == "__main__":
    main()

"""Repo-root bench shim — the driver entry point.

The real harness lives in :mod:`gfx_imagecompress_tpu.bench` (also runnable
as ``python -m gfx_imagecompress_tpu.bench`` once the package is installed).
Prints ONE JSON line with the headline metric; see that module's docstring
for the marginal-timing methodology.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gfx_imagecompress_tpu.bench import main

if __name__ == "__main__":
    main()

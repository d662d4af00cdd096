"""Generate and persist the benchmark cohorts used by bench_eval.py --dir.

Writes N human-scale synthetic count files (bench_eval.make_count_files,
same rng seed 123 so numbers are comparable across sessions) plus the PCA
artifacts into a named directory, so repeated bench runs skip the
~15-minute generation.

Usage: python scripts/gen_cohort.py OUTDIR [N=3202] [--dirty]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_eval import make_count_files, make_pca_artifacts  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3202
    dirty = "--dirty" in sys.argv
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(123)
    t0 = time.perf_counter()
    make_count_files(outdir, n, rng, dirty_frac=0.3 if dirty else 0.0)
    print(f"generated {n} files in {time.perf_counter()-t0:.0f} s -> {outdir}")
    make_pca_artifacts(outdir, rng)
    print("pca artifacts done")


if __name__ == "__main__":
    main()

"""Generate and persist the benchmark cohorts used by bench_eval.py --dir.

Writes N human-scale synthetic count files (bench_eval.make_count_files,
same rng seed 123 so numbers are comparable across sessions) plus the PCA
artifacts into a named directory, so repeated bench runs skip the
~15-minute generation.

Usage: python scripts/gen_cohort.py OUTDIR [N=3202] [--dirty] [--spread K]

--spread K lays the cohort out as K separated clusters in the
rotation's (PC0, PC1) plane — the -p filter's design case (~1/K of all
pairs are candidates) instead of the one-blob worst case (79-90%).
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
    pos = [a for i, a in enumerate(sys.argv[2:], 2)
           if not a.startswith("--") and sys.argv[i - 1] != "--spread"]
    n = int(pos[0]) if pos else 3202
    dirty = "--dirty" in sys.argv
    spread_k = (
        int(sys.argv[sys.argv.index("--spread") + 1])
        if "--spread" in sys.argv
        else 0
    )
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(123)
    spread = None
    if spread_k:
        from bench_eval import N_SITES

        mat = np.random.default_rng(7).normal(0, 0.003, size=(N_SITES, 20))
        spread = (mat, spread_k)
    t0 = time.perf_counter()
    make_count_files(
        outdir, n, rng, dirty_frac=0.3 if dirty else 0.0, spread=spread
    )
    print(f"generated {n} files in {time.perf_counter()-t0:.0f} s -> {outdir}")
    make_pca_artifacts(outdir, rng, mat=spread[0] if spread else None)
    print("pca artifacts done")


if __name__ == "__main__":
    main()

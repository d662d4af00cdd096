"""-p (PCA-filtered) path itemization at cohort scale (VERDICT r3 #3).

Times every stage of the reference's large-N answer (CompareCounts.hpp:
116-218 projection, :285-308 tiers, :316-390 candidate search, then the
device pair-block scorer) on an N-sample, 96,287-site cohort:

  load            streamed counts.txt -> wire planes (shared with -a)
  project f64     quantize - center + rotation matmul, BLAS f64
  project ld      same in numpy longdouble (the reference's precision;
                  software arithmetic on x86) — skipped with --no-ld
  tier assign     search_radii
  candidates      pca_candidates enumeration (host, incl. the [N, N]
                  blocked distance matrix)
  score           compute_score_pca_tpu over the candidate pairs

Prints one JSON line with every stage in seconds plus the f64-vs-ld
cloud agreement (max abs diff and whether any candidate pair differs —
the parity gate for using f64 in production).

Usage:
  python scripts/profile_pca.py COHORT_DIR [N=3202] [--no-ld]
                                [--norm FILE] [--rot FILE]

COHORT_DIR is a gen_cohort.py output (count files + rot.tsv/norm.txt);
pass --norm /root/reference/data/human_sites_center.txt to run the REAL
centers at production shape (VERDICT r3 #4 rides this flag).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cohort = args[0]
    n = int(args[1]) if len(args) > 1 else 3202
    do_ld = "--no-ld" not in sys.argv
    norm = cohort and os.path.join(cohort, "norm.txt")
    rot = os.path.join(cohort, "rot.tsv")
    if "--norm" in sys.argv:
        norm = sys.argv[sys.argv.index("--norm") + 1]
    if "--rot" in sys.argv:
        rot = sys.argv[sys.argv.index("--rot") + 1]

    from ntsm_tpu.eval.pca import pca_candidates, project_pcs, search_radii
    from ntsm_tpu.eval.tpu import compute_score_pca_tpu, load_count_data_eval
    from ntsm_tpu.options import Options

    paths = sorted(glob.glob(os.path.join(cohort, "s*_counts.txt")))[:n]
    n = len(paths)
    print(f"# {n} samples from {cohort}; norm={norm} rot={rot}",
          file=sys.stderr)
    opts = Options(all=True, pca=rot, norm=norm, engine="tpu")

    t = {}
    t0 = time.perf_counter()
    # (the streaming loader skips the -a RectScorer when opts.pca is set)
    data = load_count_data_eval(paths, opts)
    t["load"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cloud64 = project_pcs(data, opts, fast=True)
    t["project_f64"] = time.perf_counter() - t0
    print(f"# project f64: {t['project_f64']:.2f} s", file=sys.stderr)

    cloud = cloud64
    if do_ld:
        t0 = time.perf_counter()
        cloud_ld = project_pcs(data, opts, fast=False)
        t["project_longdouble"] = time.perf_counter() - t0
        print(f"# project longdouble: {t['project_longdouble']:.2f} s",
              file=sys.stderr)

    t0 = time.perf_counter()
    radii = search_radii(data, opts)
    t["tier_assign"] = time.perf_counter() - t0
    n_inf = int(np.sum(radii >= 1e300))

    t0 = time.perf_counter()
    cand = list(pca_candidates(cloud[:, : opts.dim], radii, opts.dim))
    t["candidates"] = time.perf_counter() - t0
    print(f"# candidates: {len(cand)} pairs in {t['candidates']:.2f} s "
          f"({n_inf} exhaustive-tier samples)", file=sys.stderr)

    agree = None
    if do_ld:
        t0 = time.perf_counter()
        cand_ld = list(
            pca_candidates(cloud_ld[:, : opts.dim], radii, opts.dim)
        )
        t["candidates_ld"] = time.perf_counter() - t0
        agree = {
            "cloud_max_abs_diff": float(
                np.max(np.abs(cloud64 - cloud_ld))
            ),
            "candidate_sets_identical": cand == cand_ld,
            "n_candidates_f64": len(cand),
            "n_candidates_ld": len(cand_ld),
        }

    out_path = os.path.join(cohort, f"pca_scores_{n}.tsv")
    with open(out_path, "w") as out:
        t0 = time.perf_counter()
        compute_score_pca_tpu(data, opts, out, cloud)
        t["score"] = time.perf_counter() - t0
    print(f"# score: {t['score']:.2f} s -> {out_path}", file=sys.stderr)

    n_pairs = n * (n - 1) // 2
    wall = t["load"] + t["project_f64"] + t["tier_assign"] + (
        t["candidates"] + t["score"]
    )
    print(json.dumps({
        "metric": "eval_pca_profile",
        "n_samples": n, "n_candidates": len(cand), "n_pairs": n_pairs,
        "stages_s": {k: round(v, 2) for k, v in t.items()},
        "wall_production_s": round(wall, 2),
        "pairs_per_s": round(n_pairs / wall, 1),
        "f64_vs_longdouble": agree,
        "norm": norm,
    }))


if __name__ == "__main__":
    main()

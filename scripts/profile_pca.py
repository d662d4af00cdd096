"""-p (PCA-filtered) path itemization at cohort scale (VERDICT r3 #3,
r4 #1).

Default mode measures the STREAMED -p engine (eval/pca_stream.py): the
load phase carries projection, tier assignment, candidate decisions and
device pair scoring (NTSM_PCA_TRACE=1 prints the per-phase attribution),
so the wall is load_stream + tail (enumeration + emission).

--legacy runs the round-4 serial phases (load, then projection, then
candidates, then compute_score_pca_tpu) for same-session A/Bs; --no-ld
skips the longdouble parity projection (slow software x87).

Usage:
  python scripts/profile_pca.py COHORT_DIR [N=3202] [--no-ld] [--legacy]
                                [--norm FILE] [--rot FILE] [--ld]

COHORT_DIR is a gen_cohort.py output (count files + rot.tsv/norm.txt);
pass --norm /root/reference/data/human_sites_center.txt to run the REAL
centers at production shape (VERDICT r3 #4 rides this flag).  The
longdouble parity gate defaults OFF in streamed mode (it measures host
x87 arithmetic, not the engine); turn it on with --ld.
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
    legacy = "--legacy" in sys.argv
    do_ld = ("--ld" in sys.argv) or (legacy and "--no-ld" not in sys.argv)
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
    mode = "legacy" if legacy else "streamed"
    print(f"# {n} samples from {cohort}; norm={norm} rot={rot} [{mode}]",
          file=sys.stderr)
    opts = Options(all=True, pca=rot, norm=norm, engine="tpu")

    t = {}
    t0 = time.perf_counter()
    data = load_count_data_eval(paths, opts)
    t["load"] = time.perf_counter() - t0
    eng = getattr(data, "pca_stream", None)

    if not legacy and eng is not None:
        # streamed production path: everything but enumeration+emission
        # already ran inside the load phase
        data.pca_stream = None
        from ntsm_tpu.eval.exact import HEADER

        out_path = os.path.join(cohort, f"pca_scores_{n}.tsv")
        with open(out_path, "w") as out:
            out.write(HEADER)
            out.write("\n")
            t0 = time.perf_counter()
            eng.result_rows(data, opts, out)
            t["tail"] = time.perf_counter() - t0
        n_cand = int(eng._tr["n_pairs"])
        wall = t["load"] + t["tail"]
        print(f"# streamed: load(+stream) {t['load']:.2f} s, tail "
              f"{t['tail']:.2f} s -> {out_path}", file=sys.stderr)
    else:
        if eng is not None:  # --legacy on a stream-capable load
            eng.abort()
            data.pca_stream = None

        t0 = time.perf_counter()
        cloud64 = project_pcs(data, opts, fast=True)
        t["project_f64"] = time.perf_counter() - t0
        print(f"# project f64: {t['project_f64']:.2f} s", file=sys.stderr)

        cloud = cloud64
        t0 = time.perf_counter()
        radii = search_radii(data, opts)
        t["tier_assign"] = time.perf_counter() - t0
        n_inf = int(np.sum(radii >= 1e300))

        t0 = time.perf_counter()
        cand = list(pca_candidates(cloud[:, : opts.dim], radii, opts.dim))
        t["candidates"] = time.perf_counter() - t0
        n_cand = len(cand)
        print(f"# candidates: {n_cand} pairs in {t['candidates']:.2f} s "
              f"({n_inf} exhaustive-tier samples)", file=sys.stderr)

        out_path = os.path.join(cohort, f"pca_scores_{n}.tsv")
        with open(out_path, "w") as out:
            t0 = time.perf_counter()
            compute_score_pca_tpu(data, opts, out, cloud)
            t["score"] = time.perf_counter() - t0
        print(f"# score: {t['score']:.2f} s -> {out_path}", file=sys.stderr)
        wall = t["load"] + t["project_f64"] + t["tier_assign"] + (
            t["candidates"] + t["score"]
        )

    agree = None
    if do_ld:
        cloud64 = project_pcs(data, opts, fast=True)
        radii = search_radii(data, opts)
        t0 = time.perf_counter()
        cloud_ld = project_pcs(data, opts, fast=False)
        t["project_longdouble"] = time.perf_counter() - t0
        print(f"# project longdouble: {t['project_longdouble']:.2f} s",
              file=sys.stderr)
        cand64 = list(pca_candidates(cloud64[:, : opts.dim], radii, opts.dim))
        cand_ld = list(
            pca_candidates(cloud_ld[:, : opts.dim], radii, opts.dim)
        )
        agree = {
            "cloud_max_abs_diff": float(np.max(np.abs(cloud64 - cloud_ld))),
            "candidate_sets_identical": cand64 == cand_ld,
            "n_candidates_f64": len(cand64),
            "n_candidates_ld": len(cand_ld),
        }

    n_pairs = n * (n - 1) // 2
    print(json.dumps({
        "metric": "eval_pca_profile",
        "mode": mode,
        "n_samples": n, "n_candidates": n_cand, "n_pairs": n_pairs,
        "stages_s": {k: round(v, 2) for k, v in t.items()},
        "wall_production_s": round(wall, 2),
        "pairs_per_s": round(n_pairs / wall, 1),
        "f64_vs_longdouble": agree,
        "norm": norm,
    }))


if __name__ == "__main__":
    main()

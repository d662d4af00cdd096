"""End-to-end eval phase timer on a pre-generated cohort dir.

Prints a line per stage as it completes (load, planes+tallies dispatch,
blob compute, per-chunk fetch/format) so a hung run shows WHERE it hangs.

Usage: python scripts/profile_eval_e2e.py <cohort_dir> [n]
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    d = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9
    paths = sorted(glob.glob(os.path.join(d, "s*_counts.txt")))[:n]
    log(f"{len(paths)} count files")

    from ntsm_tpu.options import Options

    opts = Options(all=True, engine="tpu")

    import numpy as np

    import ntsm_tpu.eval.tpu as T

    t0 = time.perf_counter()
    data = T.load_count_data_eval(paths, opts)
    dev = getattr(data, "dev_planes", None)
    log(
        f"load_count_data_eval (parse+upload overlapped, "
        f"dev={'none' if dev is None else str(dev[0].dtype)}): "
        f"{time.perf_counter()-t0:.1f} s"
    )

    N = data.n_samples
    t0 = time.perf_counter()
    tallies_d, s1_d, jint_d, a_d, b_d, v_t = T._planes_and_tallies(
        *T._device_planes(data), mc=float(opts.min_cov), chunk=T.CHUNK,
        n_valid=data.n_sites,
    )
    log(f"_planes_and_tallies dispatch: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    parts = T._blob_from_planes(
        tallies_d, s1_d, jint_d, a_d, b_d, v_t, opts, N
    )
    log(f"_blob_from_planes dispatch: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    s = float(parts[0][0, 0])  # forces the whole pipeline
    log(f"device sync (scalar fetch): {time.perf_counter()-t0:.1f} s")

    P = (N * (N - 1)) // 2
    t0 = time.perf_counter()
    for p0 in range(0, P, T.STREAM_PAIRS):
        p1 = min(p0 + T.STREAM_PAIRS, P)
        t1 = time.perf_counter()
        chunk = T._fetch_blob_slice(parts, p0, p1)
        nb = sum(c.nbytes for c in chunk if c is not None)
        log(f"  fetch [{p0}:{p1}] ({nb/1e6:.0f} MB): "
            f"{time.perf_counter()-t1:.1f} s")
    log(f"total fetch: {time.perf_counter()-t0:.1f} s for {P} pairs")

    t0 = time.perf_counter()
    out = open(os.devnull, "w")
    T.compute_score_all_tpu(data, opts, out)
    log(f"compute_score_all_tpu (warm, full): {time.perf_counter()-t0:.1f} s")


if __name__ == "__main__":
    main()

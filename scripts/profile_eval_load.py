"""Itemized eval LOAD-phase profile (VERDICT r2 weak #1).

Round 2 reported N=3202 end-to-end 437 s = load 171 s + score 265 s, but
the native counts parse is ~11 ms/file (~35 s for the cohort) — this
script itemizes where the rest of the load phase goes, CPU-only:

  stage 1: open+read file bytes          (page-cache / disk)
  stage 2: load_count_arrays             (native parse into [N, L, 2] planes)
  stage 3: CountData.prepare()           (genotype cls, hets/homs/miss,
                                          error rate, cov — [N, L] numpy)
  stage 4: wire prep (_pad_sites+_wire)  (score-phase host prologue)

Usage: python scripts/profile_eval_load.py [N=256]
Rates are per-file / per-byte so they extrapolate linearly to N=3202.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # no TPU needed for load


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import glob
    import tempfile

    if "--dir" in sys.argv:  # reuse a previously generated cohort
        d = sys.argv[sys.argv.index("--dir") + 1]
        paths = sorted(glob.glob(os.path.join(d, "s*_counts.txt")))[:n]
        n = len(paths)
    else:
        from scripts.bench_eval import make_count_files

        rng = np.random.default_rng(7)
        tmp = tempfile.mkdtemp(prefix="ntsm_loadprof_")
        t0 = time.perf_counter()
        paths = make_count_files(tmp, n, rng)
        print(f"gen: {n} files in {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
    nbytes = sum(os.path.getsize(p) for p in paths)
    print(f"total bytes: {nbytes/1e6:.0f} MB ({nbytes/n/1e6:.2f} MB/file)")

    # stage 1: raw read
    t0 = time.perf_counter()
    for p in paths:
        with open(p, "rb") as fh:
            fh.read()
    t_read = time.perf_counter() - t0
    print(f"stage1 read       : {t_read:7.2f} s  {nbytes/t_read/1e6:7.0f} MB/s"
          f"  {t_read/n*1e3:6.2f} ms/file")

    # stage 2: full native bulk load (includes its own reads)
    from ntsm_tpu.io.countfile import load_count_arrays

    t0 = time.perf_counter()
    bulk = load_count_arrays(paths)
    t_bulk = time.perf_counter() - t0
    assert bulk is not None, "native parser unavailable"
    print(f"stage2 bulk parse : {t_bulk:7.2f} s  {nbytes/t_bulk/1e6:7.0f} MB/s"
          f"  {t_bulk/n*1e3:6.2f} ms/file   (parse-only ~{(t_bulk-t_read)/n*1e3:.2f} ms/file)")

    # stage 3: prepare() sub-stages
    from ntsm_tpu.eval.model import CountData
    from ntsm_tpu.options import Options

    locus_ids, distinct, mc, sc, tks, kss = bulk
    data = CountData(
        filenames=list(paths), locus_ids=locus_ids, distinct=distinct,
        max_counts=mc, sum_counts=sc, raw_total_kmers=tks, ks=kss,
        total_counts=mc.sum(axis=(1, 2)),
    )
    opts = Options(all=True)
    t0 = time.perf_counter()
    data.prepare(opts)
    t_prep = time.perf_counter() - t0
    print(f"stage3 prepare()  : {t_prep:7.2f} s  {t_prep/n*1e3:6.2f} ms/file")

    # prepare sub-itemization
    a = data.max_counts[:, :, 0]
    b = data.max_counts[:, :, 1]
    t0 = time.perf_counter()
    pa = a > opts.min_cov
    pb = b > opts.min_cov
    t_masks = time.perf_counter() - t0
    t0 = time.perf_counter()
    cls = np.zeros(a.shape, dtype=np.uint8)
    cls[pa & pb] = 1
    cls[pa & ~pb] = 2
    cls[~pa & pb] = 3
    t_cls = time.perf_counter() - t0
    t0 = time.perf_counter()
    (cls == 1).sum(axis=1); ((cls == 2) | (cls == 3)).sum(axis=1)
    (cls == 0).sum(axis=1)
    t_sums = time.perf_counter() - t0
    t0 = time.perf_counter()
    data.sum_counts.sum(axis=(1, 2)).astype(np.float64)
    t_err = time.perf_counter() - t0
    print(f"  masks {t_masks:.2f} s | cls build {t_cls:.2f} s | "
          f"hets/homs/miss {t_sums:.2f} s | err sums {t_err:.2f} s")

    # stage 4: wire prep
    from ntsm_tpu.eval.tpu import CHUNK, _wire_plane

    t0 = time.perf_counter()
    a_np = _wire_plane(data.max_counts, 0, CHUNK)
    b_np = _wire_plane(data.max_counts, 1, CHUNK)
    t_wire = time.perf_counter() - t0
    print(f"stage4 wire prep  : {t_wire:7.2f} s  "
          f"({(a_np.nbytes+b_np.nbytes)/1e6:.0f} MB wire)")

    total = t_bulk + t_prep + t_wire
    print(f"TOTAL load        : {total:7.2f} s  ({total/n*1e3:.2f} ms/file; "
          f"x{3202/n:.1f} -> N=3202 ~= {total*3202/n:.0f} s)")

    # the production path since round 3: wire-mode load_count_data (u16
    # upload planes + accumulators; no [N, L, 2] materialization)
    from ntsm_tpu.eval.model import load_count_data

    t0 = time.perf_counter()
    d2 = load_count_data(paths, opts)
    t_wiremode = time.perf_counter() - t0
    mode = "wire" if d2.wire_at is not None else "plane(fallback)"
    print(f"WIRE-MODE load    : {t_wiremode:7.2f} s  ({mode}; "
          f"{t_wiremode/n*1e3:.2f} ms/file; x{3202/n:.1f} -> N=3202 "
          f"~= {t_wiremode*3202/n:.0f} s)")


if __name__ == "__main__":
    main()

"""Itemized eval SCORE-phase profile on the real TPU (VERDICT r2 weak #1).

SUPERSEDED by profile_eval_score2.py: the timings below use
block_until_ready inside the timed windows, which under-reports on the
axon tunnel (CLAUDE.md timing rule) — kept only as the record of the
first (wrong) measurement round.

Round 2's N=3202 score phase was 265 s with "plane upload" as the claimed
wall, but the u16 wire is ~1.2 GB — ~25 s on a healthy 49 MB/s link.
This itemizes every stage of compute_score_all_tpu:

  upload        device_put of the two u16 wire planes
  compile       first _planes_and_tallies trace+compile
  tallies       _planes_and_tallies execute (indicator matmuls + s1 + jint
                + the [C, N, c] relayouts)
  fetch         host fetch of tallies/s1/jint ([N, N] x 10 arrays)
  joint         the ROW_TILE fractional-pass loop (dispatch + fetch per tile)
  finalize      _finalize_stats numpy
  emit          triu gather + native row formatting + file write

Usage: python scripts/profile_eval_score.py [N=1024]
(Generates the cohort in-memory — no count files; the load phase has its
own profiler, scripts/profile_eval_load.py.)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SITES = 96287


def synth_planes(n, rng):
    freq = rng.uniform(0.05, 0.95, size=N_SITES)
    geno = (rng.random((n, N_SITES)) < freq).astype(np.int8) + (
        rng.random((n, N_SITES)) < freq
    ).astype(np.int8)
    lam = 15.0
    at = rng.poisson(lam * (2 - geno)).astype(np.int32)
    cg = rng.poisson(lam * geno).astype(np.int32)
    return at, cg


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    at, cg = synth_planes(n, rng)
    print(f"gen {time.perf_counter()-t0:.1f} s", file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from ntsm_tpu.eval import tpu as etpu
    from ntsm_tpu.eval.model import CountData
    from ntsm_tpu.options import Options

    opts = Options(all=True)
    mx = np.stack([at, cg], axis=2)
    data = CountData(
        filenames=[f"s{i}" for i in range(n)],
        locus_ids=[f"rs{i}" for i in range(N_SITES)],
        distinct=np.full((N_SITES, 2), 13, np.int64),
        max_counts=mx, sum_counts=mx * 13,
        raw_total_kmers=np.full(n, 10**9, np.int64),
        ks=np.full(n, 19, np.int64),
        total_counts=mx.sum(axis=(1, 2)),
    ).prepare(opts)

    rep = {}
    t0 = time.perf_counter()
    a_np = etpu._wire_plane(mx, 0, etpu.CHUNK)
    b_np = etpu._wire_plane(mx, 1, etpu.CHUNK)
    rep["wire_prep"] = time.perf_counter() - t0
    wire_mb = (a_np.nbytes + b_np.nbytes) / 1e6

    t0 = time.perf_counter()
    a_d = jax.device_put(a_np)
    b_d = jax.device_put(b_np)
    jax.block_until_ready((a_d, b_d))
    rep["upload"] = time.perf_counter() - t0

    mc = float(opts.min_cov)
    t0 = time.perf_counter()
    out = etpu._planes_and_tallies(a_d, b_d, mc=mc, chunk=etpu.CHUNK)
    jax.block_until_ready(out)
    rep["tallies_first"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = etpu._planes_and_tallies(a_d, b_d, mc=mc, chunk=etpu.CHUNK)
    jax.block_until_ready(out)
    rep["tallies_warm"] = time.perf_counter() - t0
    tallies_d, s1_d, jint_d, a_t, b_t, v_t = out

    t0 = time.perf_counter()
    tallies = {k: np.asarray(v).astype(np.int64) for k, v in tallies_d.items()}
    s1_h = [np.asarray(x).astype(np.float64) for x in s1_d]
    jint = (
        np.asarray(jint_d[0]).astype(np.float64)
        + np.asarray(jint_d[1]).astype(np.float64)
    )
    rep["fetch_nn"] = time.perf_counter() - t0
    s1 = (s1_h[0] + s1_h[1]) - (s1_h[2] + s1_h[3])

    joint_fn = etpu._make_joint_fn(opts.min_cov)
    T = etpu.ROW_TILE
    # compile one tile first
    t0 = time.perf_counter()
    r = joint_fn(a_t[:, :T], b_t[:, :T], v_t[:, :T], a_t, b_t, v_t)
    jax.block_until_ready(r)
    rep["joint_tile0"] = time.perf_counter() - t0

    J = np.zeros((n, n), np.float64)
    t_disp = 0.0
    t_fetch = 0.0
    n_tiles = 0
    t_all = time.perf_counter()
    for r0 in range(0, n, T):
        r1 = min(r0 + T, n)
        if r1 - r0 < T:
            break  # skip ragged tail for clean per-tile stats
        t0 = time.perf_counter()
        fh, fl = joint_fn(
            a_t[:, r0:r1], b_t[:, r0:r1], v_t[:, r0:r1], a_t, b_t, v_t
        )
        jax.block_until_ready((fh, fl))
        t_disp += time.perf_counter() - t0
        t0 = time.perf_counter()
        J[r0:r1] = jint[r0:r1] - (
            np.asarray(fh).astype(np.float64) + np.asarray(fl).astype(np.float64)
        )
        t_fetch += time.perf_counter() - t0
        n_tiles += 1
    rep["joint_loop"] = time.perf_counter() - t_all
    rep["joint_disp"] = t_disp
    rep["joint_fetch"] = t_fetch

    t0 = time.perf_counter()
    stats = etpu._finalize_stats(data, opts, tallies, s1, J)
    rep["finalize"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    with open("/tmp/score_prof_out.tsv", "w") as outf:
        outf.write(etpu.HEADER)
        outf.write("\n")
        ok = etpu._write_rows_native(data, opts, outf, stats)
    rep["emit"] = time.perf_counter() - t0
    rep["emit_native"] = float(ok)

    print(f"N={n}  wire={wire_mb:.0f} MB  tiles={n_tiles} x {T} rows")
    for k, v in rep.items():
        print(f"  {k:14s}: {v:8.2f} s")
    total = (
        rep["wire_prep"] + rep["upload"] + rep["tallies_warm"]
        + rep["fetch_nn"] + rep["joint_loop"] + rep["finalize"] + rep["emit"]
    )
    print(f"  {'TOTAL(warm)':14s}: {total:8.2f} s   "
          f"({n*(n-1)/2/total:.0f} pairs/s)")


if __name__ == "__main__":
    main()

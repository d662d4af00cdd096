"""Counting link-efficiency ATTRIBUTION (VERDICT r4 #3).

exp_link_ab measured the full pipeline at 0.65 of the raw junk-upload
rate and BASELINE attributed the missing third to "device step time plus
drains serializing with uploads" — an explanation, not a measurement.
This experiment splits the gap with four same-session interleaved arms:

  raw       junk [AGG, B, rowbytes] uploads only (the link ceiling)
  raw+step  same uploads, PLUS the production cadence of count_step_v3
            dispatches on PRE-uploaded data (chained counts carry) and
            stacked diag drains every 16 steps.  Upload bytes and step
            count match the wire arm.  If this arm ~= raw, h2d transfers
            and execution overlap on the tunnel/device; if it ~= wire,
            the gap IS transfer x execute channel serialization and no
            host-side restructuring can recover it.
  raw+dep   as raw+step but steps consume the just-uploaded buffers
            (adds the true data dependency; isolates whether dependency
            ordering — not channel capacity — costs anything)
  wire      the full engine (parse+pack+upload+steps+drains)

Each arm reports achieved upload MB/s over the SAME byte count.

Usage: python scripts/exp_link_ab2.py [mbases=200] [rounds=2]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_link_ab import _make_table, _write_fastq  # noqa: E402


def main() -> None:
    mbases = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.default_rng(7)

    import jax.numpy as jnp

    from ntsm_tpu.count.engine import EngineConfig, run_count_v3
    from ntsm_tpu.count.kernel_v3 import count_step_v3, split_fused, table_v3_for
    from ntsm_tpu.options import Options

    d = tempfile.mkdtemp(prefix="ntsm_linkab2_")
    try:
        fq = os.path.join(d, "reads.fq")
        t0 = time.perf_counter()
        _write_fastq(fq, mbases, 150, rng)
        print(f"# wrote {mbases} Mbase in {time.perf_counter()-t0:.0f} s",
              file=sys.stderr, flush=True)
        table = _make_table(rng)
        tab = table_v3_for(table)
        cfg = EngineConfig()
        kw = dict(k=19, L=cfg.segment_len, n_buckets=tab.n_buckets,
                  slots=tab.slots, bbits=tab.bbits)
        print("# table ready; warming up", file=sys.stderr, flush=True)

        warm = os.path.join(d, "warm.fq")
        _write_fastq(warm, 1, 150, rng)
        t0 = time.perf_counter()
        res = run_count_v3(table, [warm], Options(), cfg)
        print(f"# warmup {time.perf_counter()-t0:.0f} s", file=sys.stderr,
              flush=True)

        t0 = time.perf_counter()
        res = run_count_v3(table, [fq], Options(), cfg)
        wall0 = time.perf_counter() - t0
        wire_mb = res.wire_bytes / 1e6
        n_batches = round(res.total_bases / (cfg.batch_reads * cfg.segment_len))
        print(f"# wire round 0: {wall0:.1f} s, {wire_mb:.1f} MB, "
              f"{n_batches} batches", file=sys.stderr)

        # fused wire row = [L/4] packed codes ++ [L/8] validity bits
        # (kernel_v3.fuse_packed) = 3L/8 bytes
        row_bytes = cfg.segment_len * 3 // 8
        AGG = 4
        unit = np.frombuffer(
            rng.bytes(AGG * cfg.batch_reads * row_bytes), np.uint8
        ).reshape(AGG, cfg.batch_reads, row_bytes)
        unit2 = np.frombuffer(rng.bytes(unit.size), np.uint8).reshape(unit.shape)
        n_puts = max(2, round(wire_mb / (unit.nbytes / 1e6)))

        # pre-uploaded step inputs (one resident AGG group, reused)
        resident = jnp.asarray(unit)
        res_pk, res_vb = split_fused(resident[0], cfg.segment_len)
        counts0 = jnp.zeros(table.n_kmers + 1, dtype=jnp.int32)
        c, diag = count_step_v3(res_pk, res_vb, tab.fp, tab.keys, tab.vals,
                                counts0, **kw)
        _ = np.asarray(diag)

        def raw_round() -> float:
            t0 = time.perf_counter()
            dev = None
            for i in range(n_puts):
                dev = jnp.asarray(unit if i % 2 == 0 else unit2)
            float(jnp.sum(dev[0, 0].astype(jnp.int32)))
            return n_puts * unit.nbytes / 1e6 / (time.perf_counter() - t0)

        def raw_step_round(dep: bool) -> float:
            t0 = time.perf_counter()
            counts = counts0
            pend = []
            for i in range(n_puts):
                dev = jnp.asarray(unit if i % 2 == 0 else unit2)
                src = dev if dep else resident
                for s in range(AGG):
                    pk, vb = split_fused(src[s], cfg.segment_len)
                    counts, dg = count_step_v3(
                        pk, vb, tab.fp, tab.keys, tab.vals, counts, **kw
                    )
                    pend.append(dg)
                    if len(pend) >= 16:
                        _ = np.asarray(jnp.stack(pend))
                        pend.clear()
            if pend:
                _ = np.asarray(jnp.stack(pend))
            _ = int(counts[0])
            return n_puts * unit.nbytes / 1e6 / (time.perf_counter() - t0)

        def wire_round() -> float:
            t0 = time.perf_counter()
            r = run_count_v3(table, [fq], Options(), cfg)
            return r.wire_bytes / 1e6 / (time.perf_counter() - t0)

        raw_round()
        arms = {"raw": raw_round, "raw_step": lambda: raw_step_round(False),
                "raw_dep": lambda: raw_step_round(True), "wire": wire_round}
        results: dict = {k: [] for k in arms}
        order = list(arms)
        for r in range(rounds):
            seq = order if r % 2 == 0 else order[::-1]
            for name in seq:
                mbps = arms[name]()
                results[name].append(mbps)
                print(f"# round {r} {name:9s}: {mbps:6.1f} MB/s",
                      file=sys.stderr, flush=True)
        med = {k: float(np.median(v)) for k, v in results.items()}
        print(json.dumps({
            "metric": "count_link_attribution",
            "MBps": {k: round(v, 1) for k, v in med.items()},
            "eff_step": round(med["raw_step"] / med["raw"], 3),
            "eff_dep": round(med["raw_dep"] / med["raw"], 3),
            "eff_wire": round(med["wire"] / med["raw"], 3),
            "all": {k: [round(x, 1) for x in v] for k, v in results.items()},
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Counting end-to-end link-efficiency A/B (VERDICT r3 #5).

Is the steady-state counting pipeline at the tunnel's upload bound?
BASELINE.md's "the last ~30% is the link" was inferred from cross-session
drift; this measures it: in ONE process, interleaved in both orders (the
discipline exp_ont_ab.py established for the ONT question),

  raw : jax.device_put of junk u8 arrays in the production fused shape
        ([AGG=4, batch, row_bytes] — the engine's aggregated upload
        unit), issued back-to-back with one device-sum sync at the end.
        This is the achievable tunnel upload rate for the engine's own
        transfer pattern, with zero parse/pack/compute attached.
  wire: run_count_v3 over a pre-written N-Mbase 150 bp FASTQ (the
        bench_realistic workload); achieved upload rate =
        res.wire_bytes / wall.

efficiency = wire MB/s / raw MB/s.  >= ~90% ⇒ counting end-to-end IS
link-bound and the cross-session 68-93 Mbase/s spread is the link, not
the pipeline; materially below ⇒ the gap is host/pipeline overhead and
is worth attacking.

Reference context: the reference's ingest (FingerPrint.hpp:46-87) has no
device link at all — this experiment prices the one cost our design adds.

Usage: python scripts/exp_link_ab.py [mbases=200] [rounds=3]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_fastq(path: str, mbases: int, readlen: int, rng) -> None:
    """Fixed-width records assembled as one byte matrix per chunk: the
    per-read Python join measured ~10 min for 200 Mbase on this 1-core
    host (and made tunnel hangs indistinguishable from the write)."""
    n_reads = mbases * 1_000_000 // readlen
    alpha = np.array([65, 67, 71, 84], dtype=np.uint8)
    name_w = 12  # @r%09d\n
    rec_w = name_w + readlen + 1 + 2 + readlen + 1
    with open(path, "wb") as fh:
        chunk = 50000
        rec = np.empty((chunk, rec_w), np.uint8)
        rec[:, name_w - 1] = 10
        rec[:, name_w + readlen] = 10
        rec[:, name_w + readlen + 1] = ord("+")
        rec[:, name_w + readlen + 2] = 10
        rec[:, name_w + readlen + 3 : rec_w - 1] = ord("I")
        rec[:, rec_w - 1] = 10
        for c0 in range(0, n_reads, chunk):
            nn = min(chunk, n_reads - c0)
            names = np.frombuffer(
                b"".join(b"@r%09d\n" % (c0 + i) for i in range(nn)),
                np.uint8,
            ).reshape(nn, name_w)
            rec[:nn, :name_w] = names
            rec[:nn, name_w : name_w + readlen] = alpha[
                rng.integers(0, 4, size=(nn, readlen))
            ]
            fh.write(rec[:nn].tobytes())


def _make_table(rng):
    from ntsm_tpu.io.sites import SiteTable

    mask38 = (1 << 38) - 1
    hashes = np.unique(
        rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64)
    )
    n = hashes.shape[0]
    return SiteTable(
        site_ids=[f"rs{i}" for i in range(96287)],
        kmer_hashes=hashes,
        kmer_site=np.repeat(np.arange(96287), 26)[:n].astype(np.int32),
        kmer_allele=np.tile(np.arange(26) % 2, 96287)[:n].astype(np.uint8),
        distinct=np.full((96287, 2), 13, dtype=np.int64),
        k=19,
    )


def main() -> None:
    mbases = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rng = np.random.default_rng(7)

    import jax
    import jax.numpy as jnp

    from ntsm_tpu.count.engine import EngineConfig, run_count_v3
    from ntsm_tpu.options import Options

    d = tempfile.mkdtemp(prefix="ntsm_linkab_")
    try:
        fq = os.path.join(d, "reads.fq")
        t0 = time.perf_counter()
        _write_fastq(fq, mbases, 150, rng)
        print(f"# wrote {mbases} Mbase in {time.perf_counter()-t0:.0f} s",
              file=sys.stderr)
        table = _make_table(rng)

        # warmup: table build + executable compile + first transfers
        warm = os.path.join(d, "warm.fq")
        _write_fastq(warm, 1, 150, rng)
        cfg = EngineConfig()
        t0 = time.perf_counter()
        res = run_count_v3(table, [warm], Options(), cfg)
        print(f"# warmup {time.perf_counter()-t0:.0f} s", file=sys.stderr)

        # size the raw arm from a first wire round so both arms move
        # comparable bytes per round
        t0 = time.perf_counter()
        res = run_count_v3(table, [fq], Options(), cfg)
        wall0 = time.perf_counter() - t0
        wire_mb = res.wire_bytes / 1e6
        print(f"# wire round 0: {wall0:.1f} s, {wire_mb:.1f} MB shipped, "
              f"{res.total_bases/wall0/1e6:.1f} Mbase/s", file=sys.stderr)

        # raw-arm buffers: the engine's aggregated upload unit; two
        # distinct buffers alternated so no caching layer can skip a send
        row_bytes = cfg.segment_len * 3 // 8 + cfg.segment_len // 8
        unit = np.frombuffer(
            rng.bytes(4 * cfg.batch_reads * row_bytes), np.uint8
        ).reshape(4, cfg.batch_reads, row_bytes)
        unit2 = np.frombuffer(
            rng.bytes(unit.size), np.uint8
        ).reshape(unit.shape)
        n_puts = max(2, round(wire_mb / (unit.nbytes / 1e6)))

        def raw_round() -> float:
            t0 = time.perf_counter()
            dev = None
            for i in range(n_puts):
                dev = jnp.asarray(unit if i % 2 == 0 else unit2)
            float(jnp.sum(dev[0, 0].astype(jnp.int32)))  # sync the queue
            dt = time.perf_counter() - t0
            return n_puts * unit.nbytes / 1e6 / dt

        def wire_round() -> tuple[float, float]:
            t0 = time.perf_counter()
            r = run_count_v3(table, [fq], Options(), cfg)
            dt = time.perf_counter() - t0
            return r.wire_bytes / 1e6 / dt, r.total_bases / dt / 1e6

        raw_round()  # raw-arm warm (first junk upload may page/pin)

        raws, wires, mbps = [], [], []
        for r in range(rounds):
            if r % 2 == 0:
                raws.append(raw_round())
                w, mb = wire_round()
            else:
                w, mb = wire_round()
                raws.append(raw_round())
            wires.append(w)
            mbps.append(mb)
            print(f"# round {r}: raw {raws[-1]:6.1f} MB/s | wire "
                  f"{w:6.1f} MB/s ({mb:6.1f} Mbase/s end-to-end)",
                  file=sys.stderr)

        raw_med = float(np.median(raws))
        wire_med = float(np.median(wires))
        import json

        print(json.dumps({
            "metric": "count_link_efficiency",
            "raw_upload_MBps": round(raw_med, 1),
            "achieved_wire_MBps": round(wire_med, 1),
            "efficiency": round(wire_med / raw_med, 3),
            "end_to_end_Mbase_s": round(float(np.median(mbps)), 1),
            "mbases": mbases, "rounds": rounds,
            "raw_all": [round(x, 1) for x in raws],
            "wire_all": [round(x, 1) for x in wires],
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Interleaved A/B: 150 bp vs 20 kb end-to-end counting (VERDICT r2 #3).

BASELINE recorded 93 Mbase/s (150 bp) vs 55 Mbase/s (20 kb) from separate
sessions.  profile_ont_host.py exonerated the host: parse+encode+dense-pack
runs 0.82-1.12 Gbase/s at BOTH read lengths and the dense wire is
byte-identical (0.273 B/base, same rows, same batch count).  The device
step sees identical [B, 256] packed rows either way.  So the gap is either
(a) a real pipeline-shape effect or (b) tunnel-bandwidth drift between the
two measurement sessions.

This settles it the only honest way on a time-varying link: ONE process,
one warmup, then alternating 150bp/20kb dense runs back-to-back, several
rounds, both orders.  Usage: python scripts/exp_ont_ab.py [mbases=100] [rounds=3]

Caveat (advisor r3): the table holds random 38-bit values while read
k-mers hash through the full 64-bit mixer, so true table hits are ~zero
and the per-batch verify/scatter work for the 3-13K real hits is absent.
Both A/B arms share the bias, so the no-ONT-penalty conclusion stands,
but absolute Mbase/s here is slightly optimistic vs real site-dense data
(bench_realistic.py plants real site k-mers and is the absolute number).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen(fq, mbases, readlen, rng):
    n_reads = mbases * 1_000_000 // readlen
    alpha = np.array([65, 67, 71, 84], dtype=np.uint8)
    with open(fq, "wb") as fh:
        qual = b"I" * readlen
        chunk = max(1, 50_000_000 // (readlen * 4))
        for c0 in range(0, n_reads, chunk):
            nn = min(chunk, n_reads - c0)
            reads = alpha[rng.integers(0, 4, size=(nn, readlen))]
            fh.write(
                b"".join(
                    b"@r%d\n" % (c0 + i) + reads[i].tobytes() + b"\n+\n"
                    + qual + b"\n"
                    for i in range(nn)
                )
            )


def main() -> None:
    mbases = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rng = np.random.default_rng(7)
    d = tempfile.mkdtemp(prefix="ntsm_ontab_")
    try:
        _run(d, mbases, rounds, rng)
    finally:
        # ~400+ MB of FASTQ per documented run — don't leave it in /tmp
        shutil.rmtree(d, ignore_errors=True)


def _run(d: str, mbases: int, rounds: int, rng) -> None:
    from ntsm_tpu.count.engine import EngineConfig, run_count_v3
    from ntsm_tpu.io.sites import SiteTable
    from ntsm_tpu.options import Options

    mask38 = (1 << 38) - 1
    hashes = np.unique(
        rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64)
    )
    n = hashes.shape[0]
    table = SiteTable(
        site_ids=[f"rs{i}" for i in range(96287)],
        kmer_hashes=hashes,
        kmer_site=np.repeat(np.arange(96287), 26)[:n].astype(np.int32),
        kmer_allele=np.tile(np.arange(26) % 2, 96287)[:n].astype(np.uint8),
        distinct=np.full((96287, 2), 13, dtype=np.int64),
        k=19,
    )

    files = {}
    for rl in (150, 20000):
        fq = os.path.join(d, f"r{rl}.fq")
        gen(fq, mbases, rl, rng)
        files[rl] = fq

    # warmup (table upload + exec load)
    warm = os.path.join(d, "warm.fq")
    gen(warm, 1, 150, rng)
    t0 = time.perf_counter()
    run_count_v3(table, [warm], Options(), EngineConfig())
    print(f"# warmup {time.perf_counter()-t0:.0f}s", flush=True)

    rates: dict[int, list[float]] = {150: [], 20000: []}
    for r in range(rounds):
        order = (150, 20000) if r % 2 == 0 else (20000, 150)
        for rl in order:
            t0 = time.perf_counter()
            res = run_count_v3(
                table, [files[rl]], Options(), EngineConfig(dense=True)
            )
            dt = time.perf_counter() - t0
            mbs = res.total_bases / dt / 1e6
            rates[rl].append(mbs)
            print(
                f"round {r} readlen={rl:6d}: {dt:6.1f} s  {mbs:6.1f} Mbase/s",
                flush=True,
            )
    for rl in (150, 20000):
        a = np.array(rates[rl])
        print(
            f"readlen={rl:6d}: median {np.median(a):6.1f} Mbase/s  "
            f"(min {a.min():.1f} max {a.max():.1f})"
        )


if __name__ == "__main__":
    main()

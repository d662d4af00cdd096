"""Realistic end-to-end count benchmark: 150 bp reads, human-scale table.

Measures `run_count_v3` wall time (host read+pack+feed + device pipeline)
on an N-Mbase synthetic 150bp FASTQ against a 96287-site / 2.5M-k-mer
table, dense row packing on vs off.

Usage: python scripts/bench_realistic.py [mbases] [readlen]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mbases = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    readlen = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    n_reads = mbases * 1_000_000 // readlen
    rng = np.random.default_rng(7)

    d = tempfile.mkdtemp(prefix="ntsm_realbench_")
    fq = os.path.join(d, "reads.fq")
    alpha = np.array([65, 67, 71, 84], dtype=np.uint8)
    t0 = time.perf_counter()
    with open(fq, "wb") as fh:
        qual = b"I" * readlen
        chunk = 50000
        for c0 in range(0, n_reads, chunk):
            nn = min(chunk, n_reads - c0)
            reads = alpha[rng.integers(0, 4, size=(nn, readlen))]
            fh.write(
                b"".join(
                    b"@r%d\n" % (c0 + i) + reads[i].tobytes() + b"\n+\n" + qual + b"\n"
                    for i in range(nn)
                )
            )
    print(f"# wrote {mbases} Mbase ({n_reads} reads) in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    from ntsm_tpu.count.engine import EngineConfig, run_count_v3
    from ntsm_tpu.io.sites import SiteTable
    from ntsm_tpu.options import Options

    # synthetic human-scale site table (bypasses the FASTA parse)
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

    verbose = 2 if os.environ.get("NTSM_BENCH_VERBOSE") else 0

    # Warmup: the FIRST engine run in a process pays one-time costs —
    # the 20 MB hash upload + device table build (TableV3.from_hashes_device;
    # formerly a ~436 MB plane upload) and the executable compile/load; on a
    # congested tunnel that can still be minutes, and whichever mode ran
    # first absorbed it (measured: swapping the order swaps which mode
    # looks 400x slower).  Run a tiny throwaway count first so both timed
    # runs measure the steady-state pipeline.
    warm = os.path.join(d, "warm.fq")
    with open(warm, "wb") as fh:
        r = alpha[rng.integers(0, 4, size=(64, readlen))]
        fh.write(
            b"".join(
                b"@w%d\n" % i + r[i].tobytes() + b"\n+\n" + b"I" * readlen + b"\n"
                for i in range(64)
            )
        )
    t0 = time.perf_counter()
    run_count_v3(table, [warm], Options(), EngineConfig())
    print(f"# warmup (table upload + exec load): {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    for dense in (False, True):
        cfg = EngineConfig(dense=dense)
        t0 = time.perf_counter()
        res = run_count_v3(table, [fq], Options(verbose=verbose), cfg)
        dt = time.perf_counter() - t0
        print(
            f"dense={dense}: {dt:6.1f} s -> {res.total_bases/dt/1e6:7.1f} Mbase/s "
            f"(tk={res.total_kmers})"
        )


if __name__ == "__main__":
    main()

"""Differential fuzz: the production v3 engine vs the golden oracle
across randomized worlds, k sizes, batch geometries and packing modes.

Every case asserts exact count equality plus identical totals — the
engine's drains, hierarchical compaction, overflow tiers and dense
packing must all collapse to the reference semantics regardless of
shape (reference hot loop: FingerPrint::insertCount,
src/FingerPrint.hpp:89-103).
"""

import numpy as np
import pytest

from ntsm_tpu.count.engine import EngineConfig, run_count_v3
from ntsm_tpu.count.golden import count_files
from ntsm_tpu.io.sites import load_site_table
from ntsm_tpu.options import Options
from tests.synth import make_reads_fastq, make_site_fasta


@pytest.mark.parametrize(
    "seed,k,batch,seglen,dense",
    [
        (11, 15, 96, 128, True),
        (12, 19, 64, 160, False),
        (13, 23, 48, 192, True),
        (14, 31, 80, 224, False),
        (15, 19, 32, 128, True),
    ],
)
def test_v3_fuzz_matches_golden(tmp_path, seed, k, batch, seglen, dense):
    rng = np.random.default_rng(seed)
    sites_path = str(tmp_path / "sites.fa")
    n_sites = int(rng.integers(8, 28))
    _, sites = make_site_fasta(
        rng, n_sites=n_sites, window=k + 12, k=k, path=sites_path
    )
    fq = str(tmp_path / "reads.fq")
    genotype = rng.choice(["het", "at", "hom"])  # het / AT-hom / CG-hom branches
    make_reads_fastq(
        rng,
        sites,
        coverage=int(rng.integers(2, 9)),
        genotype=genotype,
        path=fq,
        error_rate=float(rng.choice([0.0, 0.01])),
    )
    table = load_site_table(sites_path, k=k, allow_dupes=False)
    golden = count_files(table, [fq])
    cfg = EngineConfig(batch_reads=batch, segment_len=seglen, dense=dense)
    res = run_count_v3(table, [fq], Options(), cfg)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers
    assert res.total_hits == golden.total_hits
    assert res.total_bases == golden.total_bases
    assert res.total_reads == golden.total_reads

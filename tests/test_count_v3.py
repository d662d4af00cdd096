"""Engine v3 (fingerprint filter + device-resident counts): parity with the
golden model across engine versions, CAND_K overflow fallback, early term."""

import numpy as np

from ntsm_tpu.count.engine import EngineConfig, run_count, run_count_v3
from ntsm_tpu.count.golden import count_files
from ntsm_tpu.io.sites import load_site_table
from ntsm_tpu.options import Options
from tests.synth import make_reads_fastq, make_site_fasta


def _world(rng, tmp_path, n_sites=24, coverage=8):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=n_sites, path=sites_path)
    fq = str(tmp_path / "reads.fq")
    make_reads_fastq(rng, sites, coverage=coverage, genotype="het", path=fq)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    return table, fq


def test_v3_matches_golden_and_v2(rng, tmp_path):
    table, fq = _world(rng, tmp_path)
    golden = count_files(table, [fq])
    for version in (1, 2, 3):
        res = run_count(table, [fq], Options(), version=version)
        np.testing.assert_array_equal(res.counts, golden.counts)
        assert res.total_kmers == golden.total_kmers
        assert res.total_hits == golden.total_hits


def test_v3_cand_overflow_falls_back_to_exact(rng, tmp_path):
    """With a tiny candidate width every batch overflows; the engine must
    recount those batches on the host and still match golden exactly."""
    table, fq = _world(rng, tmp_path, coverage=6)
    golden = count_files(table, [fq])
    cfg = EngineConfig(batch_reads=64, segment_len=128, cand_k=8)
    res = run_count_v3(table, [fq], Options(), cfg)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_hits == golden.total_hits
    assert res.total_kmers == golden.total_kmers


def test_v3_early_termination(rng, tmp_path):
    table, fq = _world(rng, tmp_path, coverage=40)
    # -m 1: threshold = n_kmers * 1 / 2 hits
    res = run_count_v3(table, [fq], Options(cov_thresh=1.0))
    assert res.early_term
    assert res.total_hits > table.n_kmers * 1.0 / 2


def test_v3_early_termination_consistent_totals(rng, tmp_path):
    """At the -m termination point the device count vector and the totals
    must describe the same set of batches: every pending batch was already
    scattered on device, so it must be drained (its n_valid/n_hits added,
    overflows retried) before the engine stops — counts.sum() == total_hits
    is the invariant that catches a skipped drain."""
    table, fq = _world(rng, tmp_path, coverage=40)
    cfg = EngineConfig(batch_reads=64, segment_len=128,
                       early_term_check_every=2)
    res = run_count_v3(table, [fq], Options(cov_thresh=1.0), cfg)
    assert res.early_term
    assert int(res.counts.sum()) == res.total_hits


def test_v3_early_termination_with_overflow_pending(rng, tmp_path):
    """A pending batch that overflowed the candidate budget contributed
    nothing on device; on early termination it must still be retried or
    host-recounted rather than silently dropped."""
    table, fq = _world(rng, tmp_path, coverage=40)
    cfg = EngineConfig(batch_reads=64, segment_len=128, cand_k=8,
                       early_term_check_every=2)
    res = run_count_v3(table, [fq], Options(cov_thresh=1.0), cfg)
    assert res.early_term
    assert int(res.counts.sum()) == res.total_hits


def test_v3_early_termination_pinned_fixture():
    """Device-engine -m semantics are batch-boundary dependent (documented
    contract: the reference's per-read check, FingerPrint.hpp:476-487, is
    itself read-order dependent under threads).  This pins ONE
    deterministic device-engine -m run — config, input, and full output —
    so the semantics cannot silently drift."""
    import pathlib

    from ntsm_tpu.io.countfile import format_counts
    from ntsm_tpu.io.sites import load_site_table

    fix = pathlib.Path(__file__).parent / "fixtures"
    import os

    cwd = os.getcwd()
    os.chdir(fix)
    try:
        table = load_site_table("sites.fa", 19, allow_dupes=False)
        cfg = EngineConfig(
            batch_reads=64, segment_len=128, early_term_check_every=2
        )
        res = run_count_v3(
            table, ["sampleA.fq"], Options(cov_thresh=2.0), cfg
        )
        mx, sm = res.site_max_sum(table)
        text = format_counts(
            table.site_ids, mx, sm, table.distinct, res.total_kmers, 19
        )
        assert text == (fix / "device_m2_counts.txt").read_text()
        meta = dict(
            line.split("=")
            for line in (fix / "device_m2_meta.txt").read_text().splitlines()
        )
        assert res.early_term == (meta["early_term"] == "True")
        assert res.total_kmers == int(meta["total_kmers"])
        assert res.total_hits == int(meta["total_hits"])
        assert res.total_bases == int(meta["total_bases"])
        assert res.total_reads == int(meta["total_reads"])
        assert int(res.counts.sum()) == res.total_hits
    finally:
        os.chdir(cwd)


def test_v3_segmented_long_reads(rng, tmp_path):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=8, path=sites_path)
    fq = str(tmp_path / "long.fq")
    make_reads_fastq(rng, sites, coverage=3, read_len=1500, path=fq)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    golden = count_files(table, [fq])
    cfg = EngineConfig(batch_reads=32, segment_len=128)
    res = run_count_v3(table, [fq], Options(), cfg)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers


def test_v3_overflow_device_retry_then_host(rng, tmp_path):
    """Site-dense batches: first a device retry with 8x the candidate
    budget, then the exact host recount if still too dense — both tiers
    must stay golden-exact."""
    table, fq = _world(rng, tmp_path, coverage=6)
    golden = count_files(table, [fq])
    # cand_k=8 -> retry budget 64: dense batches overflow the first tier,
    # some fit in the retry, the rest recount on host
    for ck in (8, 2):
        cfg = EngineConfig(batch_reads=64, segment_len=128, cand_k=ck)
        res = run_count_v3(table, [fq], Options(), cfg)
        np.testing.assert_array_equal(res.counts, golden.counts)
        assert res.total_hits == golden.total_hits
        assert res.total_kmers == golden.total_kmers

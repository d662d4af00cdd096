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


def test_hierarchical_row_overflow_reports_and_zeroes(rng):
    """probe_and_count's hierarchical compaction: a row with more than
    seg_k1 candidates must zero the batch's scatter and report
    n_cand > cand_k (the engine's retry trigger); the flat path
    (seg_c=None) over the same input must count normally."""
    import jax.numpy as jnp

    from ntsm_tpu.count.kernel_v2 import pack_batch, window_hashes_packed
    from ntsm_tpu.count.kernel_v3 import build_table_v3, probe_and_count

    k, B, L = 19, 32, 128
    # one read made of a repeated site k-mer -> every window of that read
    # is a candidate (way more than seg_k1 in its row)
    base_kmer = rng.integers(0, 4, size=k, dtype=np.uint8)
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    dense_row = np.tile(base_kmer, L // k + 1)[:L]
    codes[3] = dense_row
    from ntsm_tpu.core.kmers import window_encodings
    from ntsm_tpu.core.hash import hash64_np, kmer_mask

    fw, rv, _ = window_encodings(dense_row, k)
    hashes = np.unique(
        hash64_np(np.minimum(fw, rv).astype(np.uint64), kmer_mask(k))
    )
    tab = build_table_v3(hashes)
    packed, vbits = pack_batch(codes)
    h, valid = window_hashes_packed(
        jnp.asarray(packed), jnp.asarray(vbits), k, L
    )
    # cand_k=256 keeps the hierarchy gate satisfied (R*seg_k1 >= cand_k)
    kwargs = dict(
        n_buckets=tab.n_buckets, slots=tab.slots, bbits=tab.bbits,
        cand_k=256,
    )
    counts0 = jnp.zeros(hashes.shape[0] + 1, dtype=jnp.int32)
    # hierarchical: row 3 has ~110 candidates > seg_k1=16
    c_h, d_h = probe_and_count(
        h, valid, tab.fp, tab.keys, tab.vals, counts0,
        seg_c=L - k + 1, seg_k1=16, **kwargs,
    )
    assert int(d_h[1]) > 256  # reported as overflow
    assert int(d_h[2]) == 0  # no hits claimed
    assert int(np.asarray(c_h).sum()) == 0  # scatter zeroed
    # flat: same input counts normally
    c_f, d_f = probe_and_count(
        h, valid, tab.fp, tab.keys, tab.vals, counts0,
        seg_c=None, **kwargs,
    )
    assert int(d_f[2]) > 0
    assert int(np.asarray(c_f)[:-1].sum()) == int(d_f[2])


def test_hierarchical_matches_flat_on_sparse_input(rng):
    """On input with few candidates per row the hierarchical and flat
    compactions produce identical counts and diagnostics."""
    import jax.numpy as jnp

    from ntsm_tpu.count.kernel_v2 import pack_batch, window_hashes_packed
    from ntsm_tpu.count.kernel_v3 import build_table_v3, probe_and_count

    k, B, L = 19, 64, 128
    mask = (1 << (2 * k)) - 1
    hashes = np.unique(
        rng.integers(0, mask, size=5000, dtype=np.uint64)
    )
    tab = build_table_v3(hashes)
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    packed, vbits = pack_batch(codes)
    h, valid = window_hashes_packed(
        jnp.asarray(packed), jnp.asarray(vbits), k, L
    )
    kwargs = dict(
        n_buckets=tab.n_buckets, slots=tab.slots, bbits=tab.bbits,
        cand_k=2048,
    )
    counts0 = jnp.zeros(hashes.shape[0] + 1, dtype=jnp.int32)
    c_h, d_h = probe_and_count(
        h, valid, tab.fp, tab.keys, tab.vals, counts0,
        seg_c=110, seg_k1=32, **kwargs,
    )
    c_f, d_f = probe_and_count(
        h, valid, tab.fp, tab.keys, tab.vals, counts0,
        seg_c=None, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(c_h), np.asarray(c_f))
    np.testing.assert_array_equal(np.asarray(d_h), np.asarray(d_f))


def test_device_table_build_matches_host(rng):
    """TableV3.from_hashes_device (one hash upload + device sort/scatter)
    produces exactly the host-built planes: same stable bucket order, same
    fp/key/val contents."""
    from ntsm_tpu.count.kernel_v3 import TableV3, build_table_v3

    mask = (1 << 38) - 1
    hashes = np.unique(
        rng.integers(0, mask, size=20000, dtype=np.uint64)
    )
    host = build_table_v3(hashes)
    dev = TableV3.from_hashes_device(hashes)
    assert dev.n_buckets == host.n_buckets
    assert dev.slots == host.slots
    assert dev.bbits == host.bbits
    np.testing.assert_array_equal(np.asarray(dev.keys), np.asarray(host.keys))
    np.testing.assert_array_equal(np.asarray(dev.vals), np.asarray(host.vals))
    np.testing.assert_array_equal(np.asarray(dev.fp), np.asarray(host.fp))


def test_device_table_build_tiny(rng):
    """Degenerate sizes route through the host builder."""
    from ntsm_tpu.count.kernel_v3 import TableV3

    hashes = np.unique(rng.integers(0, 1 << 38, size=5, dtype=np.uint64))
    dev = TableV3.from_hashes_device(hashes)
    assert dev.lookup is not None  # host path taken
    assert np.asarray(dev.keys).shape[1] == dev.slots


def test_small_drain_window_with_group_exec(rng, tmp_path):
    """early_term_check_every < AGG (window 2 vs group appends of 4):
    pending must stay bounded and the final drain inside pad_k — a
    single `if`-drain grew pending unboundedly and blew the pad
    assertion at end of run."""
    table, fq = _world(rng, tmp_path, coverage=12)
    golden = count_files(table, [fq])
    cfg = EngineConfig(
        batch_reads=16, segment_len=128, early_term_check_every=2
    )
    res = run_count_v3(table, [fq], Options(), cfg)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers

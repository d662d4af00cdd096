"""Counting parity: golden numpy engine vs the jitted device step, plus
count-file format checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ntsm_tpu.count.golden import count_files
from ntsm_tpu.count.kernel import count_step, make_table_arrays
from ntsm_tpu.count.engine import run_count
from ntsm_tpu.io.countfile import format_counts, load_count_files
from ntsm_tpu.io.fastx import BatchReader, read_fastx
from ntsm_tpu.io.sites import build_lookup, load_site_table
from ntsm_tpu.options import Options
from tests.synth import make_reads_fastq, make_site_fasta


@pytest.fixture
def small_world(rng, tmp_path):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=20, path=sites_path)
    fq = str(tmp_path / "reads.fq")
    make_reads_fastq(rng, sites, coverage=6, genotype="het", path=fq)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    return table, sites_path, fq


def test_site_table_shape(small_world):
    table, _, _ = small_world
    assert table.n_sites == 20
    # 13 sub-k-mers per allele (window 31, k 19), minus any collisions
    assert table.n_kmers <= 20 * 2 * 13
    assert table.distinct.sum() == table.n_kmers
    # lookup table finds every k-mer
    lk = table.lookup
    b = (table.kmer_hashes & np.uint64(lk.n_buckets - 1)).astype(np.int64)
    rows = lk.keys[b]
    assert (rows == table.kmer_hashes[:, None]).any(axis=1).all()


def test_golden_counts(small_world):
    table, _, fq = small_world
    res = count_files(table, [fq])
    assert res.total_hits == res.counts.sum()
    assert res.total_hits > 0
    # hets: both alleles covered at each site
    mx, sm = res.site_max_sum(table)
    assert (mx > 0).all()
    assert (sm >= mx).all()


def test_device_step_matches_golden(small_world):
    table, _, fq = small_world
    golden = count_files(table, [fq])

    res = run_count(table, [fq], Options())
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers
    assert res.total_hits == golden.total_hits
    assert res.total_bases == golden.total_bases
    assert res.total_reads == golden.total_reads


def test_device_step_long_reads_segmentation(rng, tmp_path):
    """Long reads split with k-1 halo must preserve the k-mer multiset."""
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=8, path=sites_path)
    fq = str(tmp_path / "long.fq")
    make_reads_fastq(rng, sites, coverage=3, read_len=1500, path=fq)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    golden = count_files(table, [fq])
    res = run_count(table, [fq], Options(segment_len=128, batch_reads=64))
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers


def test_gzip_and_multi_file(rng, tmp_path):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=5, path=sites_path)
    f1 = str(tmp_path / "a.fq.gz")
    f2 = str(tmp_path / "b.fq")
    make_reads_fastq(rng, sites[:3], coverage=4, path=f1, gz=True)
    make_reads_fastq(rng, sites[2:], coverage=4, path=f2)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    golden = count_files(table, [f1, f2])
    res = run_count(table, [f1, f2], Options())
    np.testing.assert_array_equal(res.counts, golden.counts)


def test_count_file_roundtrip(small_world, tmp_path):
    table, _, fq = small_world
    res = count_files(table, [fq])
    mx, sm = res.site_max_sum(table)
    text = format_counts(table.site_ids, mx, sm, table.distinct, res.total_kmers, 19)
    assert text.startswith("#@TK\t")
    assert "\n#@KS\t19\n#locusID\tcountAT\tcountCG\tsumAT\tsumCG\tdistinctAT\tdistinctCG\n" in text
    p = tmp_path / "c.txt"
    p.write_text(text)
    locus_ids, distinct, cfs = load_count_files([str(p)])
    assert locus_ids == table.site_ids
    np.testing.assert_array_equal(distinct, table.distinct)
    cf = cfs[0]
    np.testing.assert_array_equal(cf.max_counts, mx)
    np.testing.assert_array_equal(cf.sum_counts, sm)
    assert cf.raw_total_kmers == res.total_kmers
    assert cf.k == 19
    assert cf.total_counts == mx.sum()


def test_early_termination(small_world, capsys):
    table, _, fq = small_world
    res = count_files(table, [fq], cov_thresh=1.0)
    assert res.early_term
    full = count_files(table, [fq])
    assert res.total_hits < full.total_hits
    assert res.total_hits > table.n_kmers * 1.0 / 2


def test_n_bases_reset(rng, tmp_path):
    """Reads with Ns: windows containing N yield no k-mers."""
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=3, path=sites_path)
    fq = tmp_path / "n.fq"
    win = sites[0]["at_win"].decode()
    seq = win[:10] + "N" + win[10:]
    fq.write_text(f"@r0\n{seq}\n+\n{'I'*len(seq)}\n")
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    golden = count_files(table, [str(fq)])
    res = run_count(table, [str(fq)], Options())
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_bases == len(seq)


def test_dupes_warning_and_removal(rng, tmp_path, capsys):
    """A k-mer shared between two sites is warned about and dropped."""
    sites_path = str(tmp_path / "sites.fa")
    text, sites = make_site_fasta(rng, n_sites=2, path=sites_path)
    # duplicate site 0's AT window into site 1's AT entry
    lines = text.splitlines()
    lines[5] = lines[1]  # site1's ref seq = site0's ref seq
    (tmp_path / "dup.fa").write_text("\n".join(lines) + "\n")
    import io

    err = io.StringIO()
    table = load_site_table(str(tmp_path / "dup.fa"), 19, allow_dupes=False, err=err)
    assert "has a k-mer collision at pos:" in err.getvalue()
    # all 13 AT k-mers of site0/site1 are dupes and removed from the table
    assert table.distinct[0, 0] == 0
    assert table.distinct[1, 0] == 0
    err2 = io.StringIO()
    table_d = load_site_table(str(tmp_path / "dup.fa"), 19, allow_dupes=True, err=err2)
    # with -d the first occurrence keeps the k-mers
    assert table_d.distinct[0, 0] > 0
    assert table_d.distinct[1, 0] == 0


def test_v2_topk_overflow_fallback(rng, tmp_path, monkeypatch):
    """When a batch has more hits than the top_k capacity, the engine must
    fall back to the exact host recount."""
    import ntsm_tpu.count.kernel_v2 as k2

    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=6, path=sites_path)
    fq = str(tmp_path / "dense.fq")
    # every read is a site window -> nearly every k-mer hits
    make_reads_fastq(rng, sites, coverage=20, read_len=64, path=fq, n_noise_reads=0)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    golden = count_files(table, [fq])

    monkeypatch.setattr(k2, "TOPK", 16)
    # use a distinct segment length so the jit cache retraces with TOPK=16
    res = run_count(table, [fq], Options(segment_len=72, batch_reads=128))
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_hits == golden.total_hits
    assert res.total_kmers == golden.total_kmers


def test_cli_seglen_extension(rng, tmp_path, capsys):
    """--seglen 512 counts byte-identically to the default 256 (the
    k-mer multiset is segmentation-invariant by the k-1 halo)."""
    import ntsm_tpu.cli.count_cmd as cc

    sites = str(tmp_path / "sites.fa")
    _, site_list = make_site_fasta(rng, n_sites=12, path=sites)
    fq = str(tmp_path / "reads.fq")
    make_reads_fastq(rng, site_list, coverage=6, genotype="het", path=fq)
    rc = cc.run(["--engine", "golden", "-s", sites, fq])
    assert rc == 0
    base = capsys.readouterr().out
    # the 512 path through the REAL v3 pipeline (CPU backend in tests):
    # proves the device engine at the alternate segment shape, not just
    # the flag parse
    rc = cc.run(["--seglen", "512", "-s", sites, fq])
    assert rc == 0
    assert capsys.readouterr().out == base

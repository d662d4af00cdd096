"""Public API surface: count -> write -> evaluate -> merge round trip."""

import numpy as np

import ntsm_tpu.api as api
from tests.synth import make_reads_fastq, make_site_fasta


def test_api_round_trip(rng, tmp_path):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=16, path=sites_path)
    fq_a = str(tmp_path / "a.fq")
    fq_b = str(tmp_path / "b.fq")
    make_reads_fastq(rng, sites, coverage=8, genotype="het", path=fq_a)
    make_reads_fastq(rng, sites, coverage=8, genotype="hom_ref", path=fq_b)

    table = api.load_sites(sites_path)
    res_a = api.count(table, [fq_a])
    res_g = api.count(table, [fq_a], engine="golden")
    np.testing.assert_array_equal(res_a.counts, res_g.counts)

    ca = str(tmp_path / "a_counts.txt")
    cb = str(tmp_path / "b_counts.txt")
    api.write_counts(ca, table, res_a)
    api.write_counts(cb, table, api.count(table, [fq_b]))

    rows = api.evaluate([ca, cb])
    assert len(rows) == 1
    row = rows[0]
    assert row["sample1"].endswith("a_counts.txt")
    assert isinstance(row["score"], float)
    assert row["n"] > 0

    # exact engine agrees on classification
    rows_exact = api.evaluate([ca, cb], engine="exact")
    assert rows_exact[0]["same"] == row["same"]

    merged = str(tmp_path / "merged.txt")
    api.merge_counts([ca, cb], merged)
    res_m = api.evaluate([merged, ca])
    assert len(res_m) == 1


def test_api_conveniences(rng, tmp_path):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=8, path=sites_path)
    fq = str(tmp_path / "a.fq")
    make_reads_fastq(rng, sites, coverage=6, genotype="het", path=fq)
    table = api.load_sites(sites_path)
    res = api.count(table, [fq], engine="golden")
    cov = res.coverage(table)
    assert cov > 0
    err = res.error_rate(table, genome_size=1e5)
    assert -1.0 <= err < 1.0
    # kwargs apply on top of an explicit opts object
    res2 = api.count(
        table, [fq], max_cov=1.0, engine="golden", opts=api.Options()
    )
    assert res2.early_term

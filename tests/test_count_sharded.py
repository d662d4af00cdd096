"""Sharded v3 counting on the virtual 8-device CPU mesh: golden parity,
per-shard overflow recovery, and the end-of-run merge."""

import numpy as np

import jax

from ntsm_tpu.count.engine import EngineConfig, run_count_v3
from ntsm_tpu.count.golden import count_files
from ntsm_tpu.io.sites import load_site_table
from ntsm_tpu.options import Options
from ntsm_tpu.parallel.mesh import data_mesh
from tests.synth import make_reads_fastq, make_site_fasta


def _world(rng, tmp_path, coverage=8):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=20, path=sites_path)
    fq = str(tmp_path / "reads.fq")
    make_reads_fastq(rng, sites, coverage=coverage, genotype="het", path=fq)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    return table, fq


def test_sharded_v3_matches_golden(rng, tmp_path):
    table, fq = _world(rng, tmp_path)
    golden = count_files(table, [fq])
    mesh = data_mesh(jax.devices()[:8])
    cfg = EngineConfig(batch_reads=128, segment_len=128)
    res = run_count_v3(table, [fq], Options(), cfg, mesh=mesh)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers
    assert res.total_hits == golden.total_hits


def test_sharded_v3_per_shard_overflow_recount(rng, tmp_path):
    """cand_k=2 overflows every shard that sees hits; each overflowed shard
    is recounted from exactly its row slice — totals must still be exact."""
    table, fq = _world(rng, tmp_path, coverage=5)
    golden = count_files(table, [fq])
    mesh = data_mesh(jax.devices()[:4])
    cfg = EngineConfig(batch_reads=64, segment_len=128, cand_k=2)
    res = run_count_v3(table, [fq], Options(), cfg, mesh=mesh)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_hits == golden.total_hits
    assert res.total_kmers == golden.total_kmers


def test_sharded_batch_divisibility_error(rng, tmp_path):
    table, fq = _world(rng, tmp_path, coverage=2)
    mesh = data_mesh(jax.devices()[:8])
    cfg = EngineConfig(batch_reads=100, segment_len=128)
    try:
        run_count_v3(table, [fq], Options(), cfg, mesh=mesh)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "divisible" in str(e)

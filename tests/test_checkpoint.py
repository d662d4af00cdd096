"""Checkpoint/resume for counting: kill a run mid-stream (fault injection),
resume from the snapshot, and match an uninterrupted golden run exactly."""

import numpy as np
import pytest

from ntsm_tpu.count.engine import EngineConfig, run_count_v3
from ntsm_tpu.count.golden import count_files
from ntsm_tpu.io.sites import load_site_table
from ntsm_tpu.options import Options
from tests.synth import make_reads_fastq, make_site_fasta


def _world(rng, tmp_path, coverage=12):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=16, path=sites_path)
    fq = str(tmp_path / "reads.fq")
    make_reads_fastq(rng, sites, coverage=coverage, genotype="het", path=fq)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    return table, fq


def test_crash_and_resume_matches_golden(rng, tmp_path):
    table, fq = _world(rng, tmp_path)
    golden = count_files(table, [fq])
    ckpt = str(tmp_path / "run.ckpt")

    cfg_crash = EngineConfig(
        batch_reads=32,
        segment_len=128,
        checkpoint_path=ckpt,
        checkpoint_every=2,
        fail_after_batches=5,
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        run_count_v3(table, [fq], Options(), cfg_crash)

    import os

    assert os.path.exists(ckpt)

    cfg_resume = EngineConfig(
        batch_reads=32, segment_len=128, checkpoint_path=ckpt, checkpoint_every=2
    )
    res = run_count_v3(table, [fq], Options(), cfg_resume)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers
    assert res.total_hits == golden.total_hits
    assert res.total_bases == golden.total_bases
    assert res.total_reads == golden.total_reads


def test_checkpoint_rejects_changed_inputs(rng, tmp_path):
    table, fq = _world(rng, tmp_path, coverage=4)
    ckpt = str(tmp_path / "run.ckpt")
    cfg = EngineConfig(
        batch_reads=32, segment_len=128, checkpoint_path=ckpt, checkpoint_every=1
    )
    run_count_v3(table, [fq], Options(), cfg)
    if not __import__("os").path.exists(ckpt):
        pytest.skip("run too short to produce a snapshot")
    # different batch size -> different cursor semantics -> must refuse
    cfg2 = EngineConfig(
        batch_reads=64, segment_len=128, checkpoint_path=ckpt, checkpoint_every=1
    )
    with pytest.raises(ValueError, match="different inputs"):
        run_count_v3(table, [fq], Options(), cfg2)


def test_resume_with_sharded_engine(rng, tmp_path):
    import jax

    from ntsm_tpu.parallel.mesh import data_mesh

    table, fq = _world(rng, tmp_path)
    golden = count_files(table, [fq])
    ckpt = str(tmp_path / "run.ckpt")
    mesh = data_mesh(jax.devices()[:4])
    cfg_crash = EngineConfig(
        batch_reads=32,
        segment_len=128,
        checkpoint_path=ckpt,
        checkpoint_every=2,
        fail_after_batches=5,
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        run_count_v3(table, [fq], Options(), cfg_crash, mesh=mesh)
    cfg_resume = EngineConfig(
        batch_reads=32, segment_len=128, checkpoint_path=ckpt, checkpoint_every=2
    )
    res = run_count_v3(table, [fq], Options(), cfg_resume, mesh=mesh)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_hits == golden.total_hits

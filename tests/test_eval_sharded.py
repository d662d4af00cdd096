"""Sample-row-sharded eval statistics on the virtual CPU mesh: identical
tallies and scores vs the single-device engine (incl. a pad case)."""

import numpy as np
import pytest

import jax

from ntsm_tpu.eval.model import CountData
from ntsm_tpu.eval.tpu import compute_pair_stats_tpu
from ntsm_tpu.options import Options
from ntsm_tpu.parallel.mesh import data_mesh


def _data(rng, n_samples, n_sites=300):
    mx = rng.poisson(8, size=(n_samples, n_sites, 2)).astype(np.int32)
    mx[rng.random(mx.shape[:2]) < 0.05] = 0  # missing sites
    data = CountData(
        filenames=[f"s{i}_counts.txt" for i in range(n_samples)],
        locus_ids=[f"rs{i}" for i in range(n_sites)],
        distinct=np.full((n_sites, 2), 13, dtype=np.int64),
        max_counts=mx,
        sum_counts=mx * 13,
        raw_total_kmers=np.full(n_samples, 10_000_000, dtype=np.int64),
        ks=np.full(n_samples, 19, dtype=np.int64),
        total_counts=mx.sum(axis=(1, 2)).astype(np.int64),
    )
    return data.prepare(Options(all=True))


@pytest.mark.parametrize("n_samples", [16, 13])  # 13: pad path (not % 8)
def test_sharded_stats_match_single_device(rng, n_samples):
    data = _data(rng, n_samples)
    opts = Options(all=True)
    single = compute_pair_stats_tpu(data, opts)
    mesh = data_mesh(jax.devices()[:8])
    sharded = compute_pair_stats_tpu(data, opts, mesh=mesh)
    for key in ("n", "shared_hets", "shared_homs", "ibs0", "hets1", "homs1"):
        np.testing.assert_array_equal(sharded[key], single[key])
    iu = np.triu_indices(n_samples, 1)
    np.testing.assert_allclose(
        sharded["score"][iu], single["score"][iu], rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("n_samples", [16, 13])
def test_mesh_packed_blob_matches_single_device(rng, n_samples):
    """The mesh path's packed triangle blob (_pack_mesh_blob) must agree
    with the single-device packed path pair-for-pair."""
    data = _data(rng, n_samples)
    opts = Options(all=True)
    single = compute_pair_stats_tpu(data, opts, packed=True)
    mesh = data_mesh(jax.devices()[:8])
    packed = compute_pair_stats_tpu(data, opts, mesh=mesh, packed=True)
    assert packed["packed"] is True
    np.testing.assert_array_equal(packed["iu"], single["iu"])
    np.testing.assert_array_equal(packed["ju"], single["ju"])
    for key in ("n", "ibs0", "shared_hets", "shared_homs",
                "hets1", "hets2", "homs1", "homs2"):
        np.testing.assert_array_equal(packed[key], single[key])
    np.testing.assert_allclose(
        packed["score"], single["score"], rtol=1e-9, atol=1e-9
    )


def test_mesh_streamed_emission_matches_single_device(rng, monkeypatch):
    """compute_score_all_tpu over a mesh vs the single-device rect
    engine: every non-score column byte-identical, scores within the
    engine's compensated-f32 envelope (the two paths block the matmuls
    differently, so per-entry low bits may differ — the contract is
    exact integer columns + identical classification, CLAUDE.md)."""
    import io

    import ntsm_tpu.eval.tpu as T

    data = _data(rng, 13)
    opts = Options(all=True)
    monkeypatch.setattr(T, "_auto_mesh", lambda: None)
    single = io.StringIO()
    T.compute_score_all_tpu(data, opts, single)
    mesh = data_mesh(jax.devices()[:8])
    monkeypatch.setattr(T, "_auto_mesh", lambda: mesh)
    sharded = io.StringIO()
    T.compute_score_all_tpu(data, opts, sharded)
    sl = sharded.getvalue().splitlines()
    gl = single.getvalue().splitlines()
    assert len(sl) == len(gl)
    assert sl[0] == gl[0]
    for srow, grow in zip(sl[1:], gl[1:]):
        sf, gf = srow.split("\t"), grow.split("\t")
        assert sf[:2] == gf[:2]
        assert sf[3:] == gf[3:]  # same/relate/ints/dist all byte-equal
        # deep-count tiny cohort: the adversarial envelope is ~1.5e-5 abs
        # (CLAUDE.md); random production-shape cohorts sit at ~5e-6
        assert float(sf[2]) == pytest.approx(float(gf[2]), abs=2e-5)


def test_mesh_packed_wide_tier_matches(rng, monkeypatch):
    """Force the wide (all-f32, hi=None) blob tier through the mesh
    packed path — real cohorts ride narrow; this pins the fallback."""
    import ntsm_tpu.eval.blob as B

    data = _data(rng, 9)
    opts = Options(all=True)
    single = compute_pair_stats_tpu(data, opts, packed=True)
    monkeypatch.setattr(B, "NARROW_WIRE_MAX_SITES", 0)
    mesh = data_mesh(jax.devices()[:8])
    packed = compute_pair_stats_tpu(data, opts, mesh=mesh, packed=True)
    for key in ("n", "ibs0", "shared_hets", "hets2", "homs2"):
        np.testing.assert_array_equal(packed[key], single[key])
    np.testing.assert_allclose(
        packed["score"], single["score"], rtol=1e-9, atol=1e-9
    )


def test_mesh_fuzz_random_shapes(rng):
    """Random (N, L, min_cov) trials through the mesh packed path vs the
    single-device packed path — pad interplay on both axes (sample rows
    pad to the device count, site columns pad to CHUNK)."""
    mesh = data_mesh(jax.devices()[:8])
    for trial in range(4):
        n_samples = int(rng.integers(9, 20))
        n_sites = int(rng.integers(150, 600))
        mc = int(rng.integers(-1, 3))  # -1: pad columns pass > mc
        data = _data(rng, n_samples, n_sites=n_sites)
        opts = Options(all=True, min_cov=mc)
        single = compute_pair_stats_tpu(data, opts, packed=True)
        packed = compute_pair_stats_tpu(data, opts, mesh=mesh, packed=True)
        for key in ("n", "ibs0", "shared_hets", "shared_homs",
                    "hets1", "hets2", "homs1", "homs2"):
            np.testing.assert_array_equal(
                packed[key], single[key], err_msg=f"trial {trial} {key}"
            )
        np.testing.assert_allclose(
            packed["score"], single["score"], rtol=1e-9, atol=1e-9,
            err_msg=f"trial {trial}",
        )

"""Mesh rect engine (eval/rect_mesh.py): byte parity vs the
single-device rect engine — same impl op sequence per rect, so the TSV
must be identical — both post-load and through the streaming loader."""

import io

import numpy as np
import pytest

import jax

from ntsm_tpu.eval.model import CountData
from ntsm_tpu.options import Options
from ntsm_tpu.parallel.mesh import data_mesh


def _data(rng, n_samples, n_sites=300):
    mx = rng.poisson(8, size=(n_samples, n_sites, 2)).astype(np.int32)
    mx[rng.random(mx.shape[:2]) < 0.05] = 0
    mx[1] = mx[0]  # duplicate pair
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


@pytest.mark.parametrize("n_samples", [13, 300])
def test_mesh_rect_byte_parity_vs_single(rng, monkeypatch, n_samples):
    """N=300 spans two column blocks: full, ragged, and both diagonal
    rect kinds cross the mesh; output must be byte-identical to the
    single-device rect engine (same _rect_stats_impl sequence)."""
    import ntsm_tpu.eval.tpu as T

    data = _data(rng, n_samples)
    opts = Options(all=True)
    monkeypatch.setattr(T, "_auto_mesh", lambda: None)
    single = io.StringIO()
    T.compute_score_all_tpu(data, opts, single)

    mesh = data_mesh(jax.devices()[:8])
    monkeypatch.setattr(T, "_auto_mesh", lambda: mesh)
    meshed = io.StringIO()
    T.compute_score_all_tpu(data, opts, meshed)

    assert single.getvalue() == meshed.getvalue()


@pytest.mark.skipif(
    "not __import__('ntsm_tpu.native', fromlist=['native']).available()",
    reason="native library unavailable (wire loader never streams)",
)
def test_mesh_rect_streamed_loader_parity(tmp_path, rng):
    """End-to-end through load_count_data_eval on real count files under
    the 8-device mesh: the loader attaches a host-fed MeshRectScorer
    (no single-device uploads) and the emitted TSV matches the
    single-device streamed run byte for byte."""
    import ntsm_tpu.eval.tpu as T
    from ntsm_tpu.eval.tpu import load_count_data_eval
    from ntsm_tpu.io.countfile import format_counts
    from ntsm_tpu.eval.rect_mesh import MeshRectScorer

    N, L = 270, 60
    site_ids = [f"rs{1000+i}" for i in range(L)]
    distinct = np.full((L, 2), 9, dtype=np.int64)
    paths = []
    for s in range(N):
        mc = rng.integers(0, 20, size=(L, 2)).astype(np.int64)
        p = tmp_path / f"s{s:04d}_counts.txt"
        p.write_text(
            format_counts(site_ids, mc, mc * 3, distinct, 10**7, 19)
        )
        paths.append(str(p))
    opts = Options(all=True, engine="tpu")

    mesh = data_mesh(jax.devices()[:8])
    orig_auto = T._auto_mesh
    T._auto_mesh = lambda: mesh
    try:
        data = load_count_data_eval(paths, opts)
        assert isinstance(getattr(data, "rect_scorer", None), MeshRectScorer)
        assert getattr(data, "dev_planes", None) is None  # upload skipped
        out_mesh = io.StringIO()
        T.compute_score_all_tpu(data, opts, out_mesh)
    finally:
        T._auto_mesh = orig_auto

    T._auto_mesh = lambda: None
    try:
        data2 = load_count_data_eval(paths, opts)
        out_single = io.StringIO()
        T.compute_score_all_tpu(data2, opts, out_single)
    finally:
        T._auto_mesh = orig_auto

    assert out_mesh.getvalue() == out_single.getvalue()


def test_mesh_rect_wide_tier_parity(rng, monkeypatch):
    """Counts >= 2^16 ride the f32 wide wire; the mesh block buffer must
    keep f32 (a u16 buffer would C-cast mod 2^16 silently)."""
    import ntsm_tpu.eval.tpu as T

    data = _data(rng, 40)
    # push one sample's counts into the wide tier
    data.max_counts[3] += 70_000
    data.sum_counts[3] = data.max_counts[3] * 13
    data = CountData(
        filenames=data.filenames, locus_ids=data.locus_ids,
        distinct=data.distinct, max_counts=data.max_counts,
        sum_counts=data.sum_counts, raw_total_kmers=data.raw_total_kmers,
        ks=data.ks, total_counts=data.max_counts.sum(axis=(1, 2)),
    ).prepare(Options(all=True))
    opts = Options(all=True)
    monkeypatch.setattr(T, "_auto_mesh", lambda: None)
    single = io.StringIO()
    T.compute_score_all_tpu(data, opts, single)

    mesh = data_mesh(jax.devices()[:8])
    monkeypatch.setattr(T, "_auto_mesh", lambda: mesh)
    meshed = io.StringIO()
    T.compute_score_all_tpu(data, opts, meshed)

    assert single.getvalue() == meshed.getvalue()

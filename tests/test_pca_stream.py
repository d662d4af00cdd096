"""Streaming -p engine (eval/pca_stream.py): the per-block candidate
decision must enumerate exactly pca_candidates' pruned set, and the
end-to-end streamed run_eval output must match the legacy serial -p
path line for line."""

import io
import os

import numpy as np
import pytest

from ntsm_tpu.eval.pca import DBL_MAX, pca_candidates
from ntsm_tpu.eval.pca_stream import _decide_new_block
from ntsm_tpu.options import Options


def _sq_of(cloud, dim):
    c = cloud[:, :dim]
    n = c.shape[0]
    sq = np.empty((n, n), np.float64)
    for r0 in range(0, n, 64):
        r1 = min(r0 + 64, n)
        sq[r0:r1] = ((c[r0:r1, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    return sq


def test_decide_matches_pca_candidates(rng):
    """Union of the per-block streamed decisions == the reference-order
    enumeration's directed pair set, for random clouds and radius tiers
    (incl. exhaustive DBL_MAX samples and exact tier-equality ties)."""
    for trial in range(20):
        trng = np.random.default_rng(rng.integers(0, 2**62) + trial)
        n = int(trng.integers(2, 90))
        dim = int(trng.integers(2, 6))
        cloud = trng.normal(0, 1.0, size=(n, dim))
        tiers = np.array([0.5 ** 2, 2.0 ** 2, DBL_MAX])
        radii = tiers[trng.integers(0, 3, size=n)]
        sq = _sq_of(cloud, dim)
        want = set(pca_candidates(cloud, radii, dim, sq=sq))
        got: set = set()
        s0 = 0
        while s0 < n:
            s1 = min(s0 + int(trng.integers(1, 40)), n)
            ii, kk = _decide_new_block(sq, radii, s0, s1, DBL_MAX)
            for i, k in zip(ii.tolist(), kk.tolist()):
                assert (i, k) not in got, (trial, i, k, "duplicate")
                got.add((i, k))
            s0 = s1
        assert got == want, (
            trial, len(got), len(want),
            sorted(want - got)[:5], sorted(got - want)[:5],
        )


def _write_cohort(tmp_path, rng, N, L, dirty_frac=0.25):
    from ntsm_tpu.io.countfile import format_counts

    site_ids = [f"rs{1000+i}" for i in range(L)]
    distinct = np.full((L, 2), 9, dtype=np.int64)
    freq = rng.uniform(0.1, 0.9, size=L)
    paths = []
    for s in range(N):
        geno = (rng.random(L) < freq).astype(np.int8) + (
            rng.random(L) < freq
        ).astype(np.int8)
        lam = rng.uniform(8, 15) / 2.0
        at = rng.poisson(lam * (2 - geno)).astype(np.int64)
        cg = rng.poisson(lam * geno).astype(np.int64)
        if rng.random() < dirty_frac:
            miss = rng.random(L) < 0.4
            at[miss] = 0
            cg[miss] = 0
        mc = np.stack([at, cg], axis=1)
        p = tmp_path / f"s{s:04d}_counts.txt"
        p.write_text(
            format_counts(site_ids, mc, mc * 3, distinct,
                          int(rng.integers(10**6, 10**8)), 19)
        )
        paths.append(str(p))
    # PCA artifacts
    norm = tmp_path / "norm.txt"
    norm.write_text("\n".join(
        f"{v:.6f}" for v in rng.uniform(0, 1, L)) + "\n")
    dims = 6
    rot = tmp_path / "rot.tsv"
    mat = rng.normal(0, 0.3, size=(L, dims))
    with open(rot, "w") as fh:
        fh.write("AlleleID\t" + "\t".join(
            f"PC{i}" for i in range(dims)) + "\n")
        for i in range(L):
            fh.write(site_ids[i] + "\t" + "\t".join(
                f"{x:.8f}" for x in mat[i]) + "\n")
    return paths, str(rot), str(norm)


@pytest.mark.skipif(
    "not __import__('ntsm_tpu.native', fromlist=['native']).available()",
    reason="native library unavailable (wire loader never streams)",
)
@pytest.mark.parametrize("n_samples", [9, 300])
def test_stream_matches_legacy_end_to_end(tmp_path, rng, n_samples):
    """run_eval -p through the streaming loader (projection, tiers,
    candidate decisions and pair scoring during the parse) emits exactly
    the legacy serial path's bytes.  N=300 spans two 256-row blocks
    (cross-block pairs, the held-pair dispatch path, the padded tail);
    N=9 exercises the single-partial-block path."""
    from ntsm_tpu.eval.driver import run_eval
    from ntsm_tpu.eval.tpu import compute_score_pca_tpu, load_count_data_eval
    from ntsm_tpu.eval.pca import project_pcs

    L = 90 if n_samples > 100 else 40
    paths, rot, norm = _write_cohort(tmp_path, rng, n_samples, L)
    opts = Options(all=True, pca=rot, norm=norm, engine="tpu", dim=4)

    data = load_count_data_eval(paths, opts)
    assert getattr(data, "pca_stream", None) is not None, (
        "wire loader did not attach the streaming -p engine"
    )
    b1 = io.StringIO()
    run_eval(data, opts, b1)

    # legacy serial path on a fresh load (engine detached+aborted)
    data2 = load_count_data_eval(paths, opts)
    eng = getattr(data2, "pca_stream", None)
    if eng is not None:
        eng.abort()
        data2.pca_stream = None
    cloud = project_pcs(data2, opts, fast=True)
    b2 = io.StringIO()
    compute_score_pca_tpu(data2, opts, b2, cloud)  # writes its own header

    assert b1.getvalue() == b2.getvalue()


@pytest.mark.skipif(
    "not __import__('ntsm_tpu.native', fromlist=['native']).available()",
    reason="native library unavailable",
)
def test_stream_catchup_recovers_dropped_pairs(tmp_path, rng, monkeypatch):
    """Robustness guard: if the streamed decision misses pairs (here:
    sabotaged to drop every 3rd decision), the end-of-run enumeration
    must catch-up-score them and the output stays byte-identical."""
    import ntsm_tpu.eval.pca_stream as PS
    from ntsm_tpu.eval.driver import run_eval
    from ntsm_tpu.eval.tpu import load_count_data_eval

    paths, rot, norm = _write_cohort(tmp_path, rng, 14, 45)
    opts = Options(all=True, pca=rot, norm=norm, engine="tpu", dim=4)

    data_ok = load_count_data_eval(paths, opts)
    assert getattr(data_ok, "pca_stream", None) is not None
    b_ok = io.StringIO()
    run_eval(data_ok, opts, b_ok)

    real_decide = PS._decide_new_block

    def lossy_decide(sq, radii, s0, s1, INF):
        ii, kk = real_decide(sq, radii, s0, s1, INF)
        keep = np.arange(ii.shape[0]) % 3 != 0
        return ii[keep], kk[keep]

    monkeypatch.setattr(PS, "_decide_new_block", lossy_decide)
    data_lossy = load_count_data_eval(paths, opts)
    eng = getattr(data_lossy, "pca_stream", None)
    assert eng is not None
    b_lossy = io.StringIO()
    run_eval(data_lossy, opts, b_lossy)

    assert b_ok.getvalue() == b_lossy.getvalue()
    assert b_ok.getvalue().count("\n") > 10


@pytest.mark.skipif(
    "not __import__('ntsm_tpu.native', fromlist=['native']).available()",
    reason="native library unavailable",
)
def test_stream_thresholded_mode(tmp_path, rng):
    """Non--a mode (score threshold filtering) through the streamed
    engine matches the host reference loop's emitted pair set."""
    from ntsm_tpu.eval.driver import compute_score_pca, run_eval
    from ntsm_tpu.eval.pca import project_pcs
    from ntsm_tpu.eval.tpu import load_count_data_eval

    paths, rot, norm = _write_cohort(tmp_path, rng, 12, 50)
    opts = Options(all=False, pca=rot, norm=norm, engine="tpu", dim=4)
    data = load_count_data_eval(paths, opts)
    assert getattr(data, "pca_stream", None) is not None
    b1 = io.StringIO()
    run_eval(data, opts, b1)

    opts_h = Options(all=False, pca=rot, norm=norm, engine="exact", dim=4)
    data2 = load_count_data_eval(paths, opts_h)
    cloud = project_pcs(data2, opts_h, fast=False)
    b2 = io.StringIO()
    compute_score_pca(data2, opts_h, b2, cloud)

    r1 = b1.getvalue().splitlines()
    r2 = b2.getvalue().splitlines()
    assert len(r1) == len(r2)
    # same pairs, same order; integer columns identical
    for l1, l2 in zip(r1[1:], r2[1:]):
        f1 = l1.split("\t")
        f2 = l2.split("\t")
        assert f1[:2] == f2[:2]
        assert f1[8:] == f2[8:]


@pytest.mark.skipif(
    "not __import__('ntsm_tpu.native', fromlist=['native']).available()",
    reason="native library unavailable",
)
def test_stream_trace_smoke(tmp_path, rng, monkeypatch, capsys):
    """NTSM_PCA_TRACE=1 exercises the attribution printf (a format bug
    here would crash the cohort-scale profile run at its very end)."""
    monkeypatch.setenv("NTSM_PCA_TRACE", "1")
    from ntsm_tpu.eval.driver import run_eval
    from ntsm_tpu.eval.tpu import load_count_data_eval

    paths, rot, norm = _write_cohort(tmp_path, rng, 8, 30)
    opts = Options(all=True, pca=rot, norm=norm, engine="tpu", dim=3)
    data = load_count_data_eval(paths, opts)
    assert getattr(data, "pca_stream", None) is not None
    b = io.StringIO()
    run_eval(data, opts, b)
    err = capsys.readouterr().err
    assert "[pca stream trace]" in err
    assert b.getvalue().count("\n") == 8 * 7 // 2 + 1

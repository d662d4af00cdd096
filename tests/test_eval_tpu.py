"""TPU eval engine vs the exact engine: identical integer tallies,
score agreement to tight tolerance, identical classification."""

import io
import pathlib

import numpy as np
import pytest

from ntsm_tpu.eval.exact import pair_score
from ntsm_tpu.eval.model import load_count_data
from ntsm_tpu.eval.tpu import compute_pair_stats_tpu, compute_score_all_tpu
from ntsm_tpu.options import Options

FIX = pathlib.Path(__file__).parent / "fixtures"
COUNT_FILES = [
    str(FIX / "sampleA_counts.txt"),
    str(FIX / "sampleA2_counts.txt"),
    str(FIX / "sampleB_counts.txt"),
    str(FIX / "sampleC_counts.txt"),
    str(FIX / "sampleLow_counts.txt"),
]


@pytest.fixture(scope="module")
def data():
    return load_count_data(COUNT_FILES, Options())


def test_tpu_stats_match_exact(data):
    opts = Options()
    stats = compute_pair_stats_tpu(data, opts)
    N = data.n_samples
    for i in range(N):
        for j in range(i + 1, N):
            score, n, rel = pair_score(data, i, j, opts)
            assert stats["n"][i, j] == n
            assert stats["ibs0"][i, j] == rel.ibs0
            assert stats["shared_hets"][i, j] == rel.shared_hets
            assert stats["shared_homs"][i, j] == rel.shared_homs
            assert stats["hets1"][i, j] == rel.hets1
            assert stats["homs1"][i, j] == rel.homs1
            assert stats["hets1"][j, i] == rel.hets2
            assert stats["homs1"][j, i] == rel.homs2
            if n > 0:
                assert stats["score"][i, j] == pytest.approx(score, rel=2e-6, abs=4e-6)
            else:
                assert stats["score"][i, j] == score


def test_tpu_classification_matches(data):
    opts = Options()
    stats = compute_pair_stats_tpu(data, opts)
    N = data.n_samples
    for i in range(N):
        for j in range(i + 1, N):
            score, _, _ = pair_score(data, i, j, opts)
            assert (stats["score"][i, j] < opts.score_thresh) == (
                score < opts.score_thresh
            )


def test_tpu_output_rows_match_exact_except_score_digits(data):
    """Full -a output: every non-score column byte-identical; score within
    1 ulp of the 6-decimal print."""
    from ntsm_tpu.eval.exact import compute_score_all

    opts = Options(all=True, engine="tpu")
    tpu_out = io.StringIO()
    compute_score_all_tpu(data, opts, tpu_out)
    exact_out = io.StringIO()
    compute_score_all(data, opts, exact_out)
    tl = tpu_out.getvalue().splitlines()
    el = exact_out.getvalue().splitlines()
    assert len(tl) == len(el)
    assert tl[0] == el[0]  # header
    for trow, erow in zip(tl[1:], el[1:]):
        tf = trow.split("\t")
        ef = erow.split("\t")
        assert tf[:2] == ef[:2]
        assert tf[3:] == ef[3:]
        assert float(tf[2]) == pytest.approx(float(ef[2]), abs=4e-6)


def test_tpu_larger_synthetic_cohort(rng):
    """Random 64-sample cohort over 500 sites: tallies exact, scores tight."""
    import ntsm_tpu.eval.model as M

    N, L = 64, 500
    mc = rng.integers(0, 40, size=(N, L, 2)).astype(np.int64)
    # make some same-origin pairs
    mc[1] = mc[0] + rng.integers(0, 3, size=(L, 2))
    mc[2] = np.maximum(mc[0] - rng.integers(0, 3, size=(L, 2)), 0)
    # sprinkle missing sites
    miss = rng.random((N, L)) < 0.05
    mc[miss] = 0
    data = M.CountData(
        filenames=[f"s{i}" for i in range(N)],
        locus_ids=[f"rs{i}" for i in range(L)],
        distinct=np.full((L, 2), 10, dtype=np.int64),
        max_counts=mc,
        sum_counts=mc * 3,
        raw_total_kmers=np.full(N, 10_000_000, dtype=np.int64),
        ks=np.full(N, 19, dtype=np.int64),
        total_counts=mc.sum(axis=(1, 2)),
    )
    opts = Options(genome_size=1_000_000)
    data.prepare(opts)
    stats = compute_pair_stats_tpu(data, opts)
    for i, j in [(0, 1), (0, 2), (5, 9), (30, 63), (0, 63)]:
        score, n, rel = pair_score(data, i, j, opts)
        assert stats["n"][i, j] == n
        assert stats["ibs0"][i, j] == rel.ibs0
        assert stats["shared_hets"][i, j] == rel.shared_hets
        assert stats["score"][i, j] == pytest.approx(score, rel=5e-6, abs=5e-6)


def test_wire_u16_and_overflow_guard():
    """_wire: u16 for small counts, f32 passthrough in between, and a loud
    error (not silent rounding) past 2^24 where f32 loses integers."""
    from ntsm_tpu.eval.tpu import _wire

    small = np.array([[0.0, 65535.0]], dtype=np.float32)
    assert _wire(small).dtype == np.uint16

    mid = np.array([[70000.0]], dtype=np.float32)
    out = _wire(mid)
    assert out.dtype == np.float32 and out[0, 0] == 70000.0

    huge = np.array([[2.0**24 + 2.0]], dtype=np.float64)
    with pytest.raises(ValueError, match="2\\^24"):
        _wire(huge)

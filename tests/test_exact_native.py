"""Native exact-engine kernel (native/exact_pairs.cpp) vs the Python loop.

The native kernel computes per-site f64 values bit-identical to
eval/exact.py's pair_score; only final summation order differs (<=1 ulp).
These tests pin byte-identical FORMATTED output between the two paths —
the same contract the reference-binary parity fixtures pin — across the
fixture cohort, random fuzz cohorts, and the degenerate edges (n=0 pairs,
zero-het/zero-hom samples, DBL_MAX scores).
"""

import io
import pathlib

import numpy as np
import pytest

from ntsm_tpu.eval import exact
from ntsm_tpu.eval.model import CountData, load_count_data
from ntsm_tpu.eval.exact import native_pair_stats, pair_score
from ntsm_tpu.options import Options

FIX = pathlib.Path(__file__).parent / "fixtures"
COUNT_FILES = [
    str(FIX / "sampleA_counts.txt"),
    str(FIX / "sampleA2_counts.txt"),
    str(FIX / "sampleB_counts.txt"),
    str(FIX / "sampleC_counts.txt"),
    str(FIX / "sampleLow_counts.txt"),
]


def _have_native():
    from ntsm_tpu import native

    lib = native.load()
    return lib is not None and hasattr(lib, "ntsm_exact_pairs")


pytestmark = pytest.mark.skipif(
    not _have_native(), reason="native library unavailable"
)


def _all_vs_all_both_ways(data, opts, monkeypatch):
    buf_fast = io.StringIO()
    exact.compute_score_all(data, opts, buf_fast)
    monkeypatch.setenv("NTSM_EXACT_LOOP", "1")
    buf_loop = io.StringIO()
    exact.compute_score_all(data, opts, buf_loop)
    monkeypatch.delenv("NTSM_EXACT_LOOP")
    return buf_fast.getvalue(), buf_loop.getvalue()


def test_fixture_cohort_byte_identical(monkeypatch):
    data = load_count_data(COUNT_FILES, Options())
    for all_flag in (True, False):
        opts = Options(all=all_flag)
        data.prepare(opts)
        fast, loop = _all_vs_all_both_ways(data, opts, monkeypatch)
        assert fast == loop


def _synth_data(rng, N, L, miss_frac=0.05, hi=40):
    mc = rng.integers(0, hi, size=(N, L, 2)).astype(np.int64)
    mc[rng.random((N, L)) < miss_frac] = 0
    return CountData(
        filenames=[f"s{i}" for i in range(N)],
        locus_ids=[f"rs{i}" for i in range(L)],
        distinct=np.full((L, 2), 10, dtype=np.int64),
        max_counts=mc,
        sum_counts=mc * 3,
        raw_total_kmers=np.full(N, 10**7, dtype=np.int64),
        ks=np.full(N, 19, dtype=np.int64),
        total_counts=mc.sum(axis=(1, 2)),
    )


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_byte_identical(trial, monkeypatch):
    rng = np.random.default_rng(1000 + trial)
    N = int(rng.integers(3, 14))
    L = int(rng.integers(50, 3000))
    data = _synth_data(rng, N, L, miss_frac=float(rng.uniform(0, 0.4)))
    opts = Options(all=bool(trial % 2), genome_size=1_000_000)
    data.prepare(opts)
    fast, loop = _all_vs_all_both_ways(data, opts, monkeypatch)
    assert fast == loop


def test_degenerate_edges_byte_identical(monkeypatch):
    """n=0 overlaps (DBL_MAX scores), all-hom and all-het samples
    (0/0 -> -nan and x/0 -> inf relate columns)."""
    rng = np.random.default_rng(7)
    N, L = 6, 400
    mc = np.zeros((N, L, 2), dtype=np.int64)
    mc[0, :200, 0] = 10          # hom AT on first half
    mc[1, 200:, 1] = 10          # hom CG on second half: zero overlap w/ 0
    mc[2, :, 0] = 10             # all hom AT: zero hets
    mc[3, :, 0] = 10
    mc[3, :, 1] = 10             # all het: zero homs
    mc[4, :, 0] = 10
    mc[4, :, 1] = 10
    mc[5] = rng.integers(0, 8, size=(L, 2))
    data = CountData(
        filenames=[f"e{i}" for i in range(N)],
        locus_ids=[f"rs{i}" for i in range(L)],
        distinct=np.full((L, 2), 10, dtype=np.int64),
        max_counts=mc,
        sum_counts=mc,
        raw_total_kmers=np.full(N, 10**6, dtype=np.int64),
        ks=np.full(N, 19, dtype=np.int64),
        total_counts=mc.sum(axis=(1, 2)),
    )
    opts = Options(all=True, genome_size=1_000_000)
    data.prepare(opts)
    fast, loop = _all_vs_all_both_ways(data, opts, monkeypatch)
    assert fast == loop
    assert "179769313486231570814527423731" in fast  # a DBL_MAX row exists


def test_native_stats_match_pair_score_exactly():
    """Integer tallies identical; scores within 2 ulp-ish of the loop."""
    rng = np.random.default_rng(3)
    data = _synth_data(rng, 8, 800)
    opts = Options(genome_size=1_000_000)
    data.prepare(opts)
    N = data.n_samples
    iu, ju = np.triu_indices(N, 1)
    score, t = native_pair_stats(data, opts, iu, ju)
    for p in range(iu.shape[0]):
        i, j = int(iu[p]), int(ju[p])
        s, n, rel = pair_score(data, i, j, opts)
        assert t["n"][p] == n
        assert t["ibs0"][p] == rel.ibs0
        assert t["shared_hets"][p] == rel.shared_hets
        assert t["shared_homs"][p] == rel.shared_homs
        assert t["hets1"][p] == rel.hets1 and t["hets2"][p] == rel.hets2
        assert t["homs1"][p] == rel.homs1 and t["homs2"][p] == rel.homs2
        assert score[p] == pytest.approx(s, rel=1e-12, abs=1e-12)


def test_pca_exact_path_byte_identical(monkeypatch, tmp_path):
    """The -p exact path through the native kernel vs the loop."""
    from ntsm_tpu.eval.driver import compute_score_pca
    from ntsm_tpu.eval.pca import project_pcs

    rng = np.random.default_rng(11)
    data = _synth_data(rng, 10, 600)
    L = data.n_sites
    dim = 4
    center = tmp_path / "center.txt"
    center.write_text("\n".join("0.5" for _ in range(L)) + "\n")
    rot = tmp_path / "rot.tsv"
    with open(rot, "w") as fh:
        fh.write("rsid\t" + "\t".join(f"PC{c}" for c in range(dim)) + "\n")
        for s in range(L):
            vals = (rng.integers(-512, 513, size=dim) / 1024.0)
            fh.write(f"rs{s}\t" + "\t".join(repr(float(v)) for v in vals) + "\n")
    opts = Options(
        all=True, genome_size=1_000_000, dim=dim,
        pca=str(rot), norm=str(center),
    )
    data.prepare(opts)
    cloud = project_pcs(data, opts, fast=False)

    buf_fast = io.StringIO()
    compute_score_pca(data, opts, buf_fast, cloud)
    monkeypatch.setenv("NTSM_EXACT_LOOP", "1")
    buf_loop = io.StringIO()
    compute_score_pca(data, opts, buf_loop, cloud)
    monkeypatch.delenv("NTSM_EXACT_LOOP")
    assert buf_fast.getvalue() == buf_loop.getvalue()
    assert buf_fast.getvalue().count("\n") > 1

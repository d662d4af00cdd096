"""The one real reference data artifact: data/human_sites_center.txt.

96,287 long-double per-site centers — the only non-missing upstream blob
(SURVEY.md L6).  The reference parses it with `ss >> value` into long
double (CompareCounts.hpp:121-134).  These tests run the REAL file through
`load_norm_values` against an independent decimal.Decimal oracle, pin a
digest so a parse regression is loud, and push the real centers through
the quantize-minus-center projection (projectPCs, CompareCounts.hpp:173-210)
against a Decimal oracle.
"""

import pathlib
from decimal import Decimal, getcontext

import numpy as np
import pytest

from ntsm_tpu.eval.model import CountData
from ntsm_tpu.eval.pca import load_norm_values, load_rotation, project_pcs
from ntsm_tpu.options import Options

CENTERS = pathlib.Path("/root/reference/data/human_sites_center.txt")

pytestmark = pytest.mark.skipif(
    not CENTERS.exists(), reason="reference centers file not present"
)


@pytest.fixture(scope="module")
def centers():
    return load_norm_values(str(CENTERS))


def test_real_centers_parse_all_96287(centers):
    assert centers.shape == (96287,)
    assert centers.dtype == np.longdouble
    # Real-world value range: all in [0, 1), none negative, none NaN/inf.
    assert np.all(np.isfinite(centers))
    assert centers.min() >= 0.0
    assert centers.max() < 1.0


def test_real_centers_vs_decimal_oracle(centers):
    """Every one of the 96,287 long-double parses is within 1 ulp of the
    exact decimal value (x86 longdouble = 64-bit mantissa -> rel err
    <= 2^-64 for correctly rounded strtold; allow 2^-63)."""
    getcontext().prec = 50
    lines = CENTERS.read_text().split()
    assert len(lines) == 96287
    tol = Decimal(2) ** -63
    bad = []
    for i, (txt, got) in enumerate(zip(lines, centers)):
        exact = Decimal(txt)
        parsed = Decimal(float(got))  # f64 repr of the longdouble; adds
        # its own <=2^-53 step, so compare the longdouble directly below
        # for the tight bound and use f64 only as a sanity screen
        if exact == 0:
            if got != 0:
                bad.append(i)
            continue
        # exact longdouble -> Decimal via integer scaling of the mantissa
        m, e = np.frexp(got)
        ld = Decimal(int(np.ldexp(m, 64))) * Decimal(2) ** (int(e) - 64)
        if abs(ld - exact) / exact > tol:
            bad.append((i, txt, float(got)))
    assert not bad, f"{len(bad)} divergent parses, first: {bad[:3]}"


def test_real_centers_digest_pinned(centers):
    """Pin a digest of the parsed values so any parse change is loud.
    Sums are computed in longdouble (deterministic on this platform)."""
    total = np.sum(centers)
    assert float(total) == pytest.approx(45205.84337913804, abs=1e-6)
    assert float(centers[0]) == pytest.approx(0.7620237351655215, rel=1e-15)
    assert float(centers[-1]) == pytest.approx(float(np.longdouble(
        CENTERS.read_text().rsplit(None, 1)[-1])), rel=0)
    # distributional fingerprint: counts per decile bucket
    hist = np.histogram(centers.astype(np.float64), bins=10, range=(0, 1))[0]
    assert hist.sum() == 96287


def test_projection_with_real_centers_vs_decimal(centers):
    """Quantize-minus-center projection using the REAL centers against a
    Decimal oracle (rotation values chosen exactly representable so the
    oracle is exact up to its final rounding)."""
    L = centers.shape[0]
    rng = np.random.default_rng(7)
    N, dim = 3, 2
    mc = rng.integers(0, 30, size=(N, L, 2)).astype(np.int64)
    mc[rng.random((N, L)) < 0.02] = 0  # missing sites stay exactly 0
    data = CountData(
        filenames=[f"s{i}" for i in range(N)],
        locus_ids=[f"rs{i}" for i in range(L)],
        distinct=np.full((L, 2), 10, dtype=np.int64),
        max_counts=mc,
        sum_counts=mc * 2,
        raw_total_kmers=np.full(N, 10**7, dtype=np.int64),
        ks=np.full(N, 19, dtype=np.int64),
        total_counts=mc.sum(axis=(1, 2)),
    )
    opts = Options()
    data.prepare(opts)

    # rotation: dyadic rationals k/1024 in [-0.5, 0.5] — exact in every
    # binary float format involved
    rot = ((rng.integers(-512, 513, size=(dim, L))) / 1024.0).astype(
        np.longdouble
    )

    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        rp = os.path.join(td, "rot.tsv")
        with open(rp, "w") as fh:
            fh.write("rsid\t" + "\t".join(f"PC{c}" for c in range(dim)) + "\n")
            for s in range(L):
                fh.write(
                    f"rs{s}\t"
                    + "\t".join(repr(float(rot[c, s])) for c in range(dim))
                    + "\n"
                )
        opts = Options(norm=str(CENTERS), pca=rp, dim=dim)
        cloud = project_pcs(data, opts, fast=False)
        cloud_fast = project_pcs(data, opts, fast=True)

    # Decimal oracle
    getcontext().prec = 60
    lines = CENTERS.read_text().split()
    centers_dec = [Decimal(t) for t in lines]
    a = mc[:, :, 0]
    b = mc[:, :, 1]
    ca = np.where(a > opts.min_cov, a, 0).astype(np.float64)
    cb = np.where(b > opts.min_cov, b, 0).astype(np.float64)
    present = (ca + cb) > 0
    half = Decimal(1) / 2
    for n in range(N):
        for c in range(dim):
            acc = Decimal(0)
            for s in range(L):
                if not present[n, s]:
                    continue
                g = ca[n, s] / (ca[n, s] + cb[n, s])
                q = Decimal(0) if g < 0.25 else (half if g < 0.75 else Decimal(1))
                acc += (q - centers_dec[s]) * Decimal(float(rot[c, s]))
            got = cloud[n, c]
            assert float(acc) == pytest.approx(got, rel=1e-12, abs=1e-9), (
                n, c, float(acc), got)
            assert cloud_fast[n, c] == pytest.approx(got, rel=1e-9, abs=1e-7)

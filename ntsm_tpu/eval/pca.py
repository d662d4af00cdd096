"""PCA projection and the radius-tier candidate search.

Projection (projectPCs, src/CompareCounts.hpp:116-218): per sample the
genotype fraction AT/(AT+CG) is quantized to {0, 0.5, 1} (thresholds 0.25 /
0.75), missing sites stay 0, the per-site center is subtracted and the
result is rotated into `dim` principal components.  On TPU this is a single
[N, L] @ [L, dim] matmul; the exact path mirrors the reference's long
double centers (numpy longdouble) for byte parity.

Candidate search (computeScorePCA, :285-528): the reference builds a
nanoflann kd-tree and does per-sample radius queries with asymmetric
pruning rules.  A kd-tree is the wrong shape for a TPU — the equivalent
here is the dense pairwise distance matrix (one [N, dim] @ [dim, N] matmul)
with the same radius tiers and pruning applied as masks.  The candidate SET
is identical; only the search algorithm differs.
"""

from __future__ import annotations

import numpy as np

from ntsm_tpu.eval.model import CountData
from ntsm_tpu.options import Options

DBL_MAX = np.finfo(np.float64).max


def load_norm_values(path: str) -> np.ndarray:
    """Per-site centering values, parsed as long double (:121-134)."""
    vals = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                vals.append(np.longdouble(line))
            else:
                # `ss >> value` on an empty line leaves value uninitialized;
                # the reference still push_backs.  Blank lines don't occur in
                # real center files; treat as 0.
                vals.append(np.longdouble(0))
    return np.array(vals, dtype=np.longdouble)


def load_rotation(path: str, n_sites: int) -> np.ndarray:
    """Rotation matrix TSV: header row, then rsID + components per site
    (:136-170).  Returns [n_components, n_sites] longdouble."""
    with open(path) as fh:
        header = fh.readline().split()
        comp_num = len(header) - 1
        rows = []
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            rows.append([np.longdouble(x) for x in parts[1 : comp_num + 1]])
    rot = np.array(rows, dtype=np.longdouble).T  # [comp, sites]
    if rot.shape[1] != n_sites:
        raise AssertionError(
            f"rotation matrix rows ({rot.shape[1]}) != norm sites ({n_sites})"
        )
    return rot


def quantized_genotype(data: CountData, opts: Options) -> np.ndarray:
    """[N, L] float64 quantized genotype fraction, 0 where missing (:173-199)."""
    a, b = data.counts_ab()
    mc = opts.min_cov
    ca = np.where(a > mc, a, 0).astype(np.float64)
    cb = np.where(b > mc, b, 0).astype(np.float64)
    den = ca + cb
    with np.errstate(divide="ignore", invalid="ignore"):
        g = np.where(den > 0, ca / np.where(den > 0, den, 1.0), 0.0)
    q = np.where(g - 0.25 < 0.0, 0.0, np.where(g - 0.75 < 0.0, 0.5, 1.0))
    return q, den > 0


def project_pcs(data: CountData, opts: Options, fast: bool | None = None) -> np.ndarray:
    """[N, dim] float64 PCA cloud, matching projectPCs' arithmetic.

    fast=True computes in f64 (BLAS) instead of numpy's software
    long-double loops: 0.09 s vs 3.7 s per 512 samples on this host, with
    ~2e-15 relative difference (tier thresholds are integers, so candidate
    sets are unaffected in practice).  Defaults to the engine selection:
    the exact engine keeps long double for bit parity of the dist column."""
    if fast is None:
        fast = getattr(opts, "engine", "exact") == "tpu"
    norm = load_norm_values(opts.norm)
    rot = load_rotation(opts.pca, norm.shape[0])
    if opts.dim > rot.shape[0]:
        raise AssertionError("opt::dim exceeds component count (:155)")
    q, present = quantized_genotype(data, opts)
    if fast:
        vals64 = np.where(present, q - norm.astype(np.float64)[None, :], 0.0)
        return vals64 @ rot[: opts.dim].T.astype(np.float64)
    # missing values stay exactly 0.0 (not 0 - center): :189-191
    vals = np.where(present, q.astype(np.longdouble) - norm[None, :], 0.0)
    # inner products in extended precision, cast per reference's double acc
    cloud = (vals @ rot[: opts.dim].T).astype(np.float64)
    return cloud


def calc_distance_sq(cloud: np.ndarray, i: int, j: int, dim: int) -> float:
    """Squared Euclidean distance (calcDistance, :923-932)."""
    d = cloud[i, :dim] - cloud[j, :dim]
    return float(np.sum(d * d))


def search_radii(data: CountData, opts: Options) -> np.ndarray:
    """Per-sample radius tier (:294-308): squared radii or DBL_MAX."""
    n = data.n_samples
    radii = np.full(n, DBL_MAX)
    prop_missing = data.miss.astype(np.float64) / float(data.n_sites)
    tier1 = (data.error_rate < opts.pc_error_thresh) & (prop_missing < opts.pc_miss_site1)
    tier2 = ~tier1 & (prop_missing < opts.pc_miss_site2)
    radii[tier1] = opts.pc_search_radius1 ** 2
    radii[tier2] = opts.pc_search_radius2 ** 2
    return radii


def pca_candidates(cloud: np.ndarray, radii: np.ndarray, dim: int):
    """Candidate pairs with the reference's pruning rules (:316-390).

    Yields (i, k) pairs in the reference's emission order: for each sample i
    (ascending), its radius-search matches sorted by distance (nanoflann
    sorts results); exhaustive samples scan k in index order.

    Pruning for a finite-radius i and a match k (dist < r_i, strict per
    nanoflann RadiusResultSet::addPoint):
      * r_i == r_k: keep only k > i
      * r_i <  r_k: skip (k's own larger search will emit the pair)
      * r_i >  r_k: keep (regardless of order)
    For r_i == DBL_MAX (exhaustive): skip j <= i only when r_j is also
    DBL_MAX; all finite-radius j are paired here.
    """
    n = cloud.shape[0]
    c = cloud[:, :dim]
    # row-blocked (a-b)^2 accumulation: same per-coordinate arithmetic
    # order as nanoflann's L2 accum (NOT the |a|^2+|b|^2-2ab matmul form,
    # whose different rounding could flip borderline radius comparisons),
    # without the [N, N, dim] transient (~1.6 GB at the N=3202 cohort)
    sq = np.empty((n, n), dtype=np.float64)
    BLK = 64
    for r0 in range(0, n, BLK):
        r1 = min(r0 + BLK, n)
        sq[r0:r1] = ((c[r0:r1, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    for i in range(n):
        if radii[i] < DBL_MAX:
            match = np.nonzero(sq[i] < radii[i])[0]
            order = match[np.argsort(sq[i][match], kind="stable")]
            for k in order:
                k = int(k)
                if radii[i] == radii[k]:
                    if k <= i:
                        continue
                elif radii[i] < radii[k]:
                    continue
                yield i, k
        else:
            for j in range(n):
                if radii[j] == DBL_MAX and j <= i:
                    continue
                yield i, j

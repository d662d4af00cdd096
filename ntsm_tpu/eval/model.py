"""In-memory model of a set of count files.

Dense-array replacement for CompareCounts' per-file vectors-of-pairs
(src/CompareCounts.hpp:30-114): counts live in [n_samples, n_sites, 2]
arrays, genotype classes and per-site single-sample likelihood terms are
precomputed vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ntsm_tpu.io.countfile import load_count_files
from ntsm_tpu.options import Options

# genotype classes (order matters for the relatedness logic)
UNKNOWN, HET, HOM_AT, HOM_CG = 0, 1, 2, 3


@dataclass
class CountData:
    filenames: list
    locus_ids: list
    distinct: np.ndarray  # [L, 2]
    max_counts: np.ndarray  # [N, L, 2]  (the reference's m_counts)
    sum_counts: np.ndarray  # [N, L, 2]  (m_sum)
    raw_total_kmers: np.ndarray  # [N] #@TK per file
    ks: np.ndarray  # [N] #@KS per file
    total_counts: np.ndarray  # [N] sum of max-counts per file

    # derived (filled by prepare())
    cls: np.ndarray = field(default=None)  # [N, L] genotype class
    _s_single: np.ndarray = field(default=None, repr=False)
    _min_cov: int = field(default=1, repr=False)
    hets: np.ndarray = field(default=None)  # [N] over all sites
    homs: np.ndarray = field(default=None)
    miss: np.ndarray = field(default=None)
    error_rate: np.ndarray = field(default=None)  # [N]
    cov: np.ndarray = field(default=None)  # [N]

    @property
    def n_samples(self) -> int:
        return self.max_counts.shape[0]

    @property
    def n_sites(self) -> int:
        return self.max_counts.shape[1]

    @property
    def s_single(self) -> np.ndarray:
        """[N, L] f64 per-site single-sample likelihood terms
        (computeSumLogPSingle, CompareCounts.hpp:968-991).  Lazy: only the
        exact engine reads it; the TPU engine derives its decomposed form
        on device.  max(den, 1) is exact — a zero denominator implies both
        masks are false (any min_cov >= 0), and it avoids the FP-invalid
        microtraps that made this ~3x slower on this host."""
        if self._s_single is None:
            a = self.max_counts[:, :, 0]
            b = self.max_counts[:, :, 1]
            mc = self._min_cov
            pa = a > mc
            pb = b > mc
            af = a.astype(np.float64)
            bf = b.astype(np.float64)
            den = np.maximum(af + bf, 1.0)
            freq_at = np.where(pa, af / den, 0.0)
            freq_cg = np.where(pb, bf / den, 0.0)
            self._s_single = af * freq_at + bf * freq_cg
        return self._s_single

    def prepare(self, opts: Options) -> "CountData":
        a = self.max_counts[:, :, 0]
        b = self.max_counts[:, :, 1]
        mc = opts.min_cov
        pa = a > mc
        pb = b > mc
        # genotype classification (calcHomHetMiss, CompareCounts.hpp:742-768)
        cls = np.zeros(a.shape, dtype=np.uint8)
        cls[pa & pb] = HET
        cls[pa & ~pb] = HOM_AT
        cls[~pa & pb] = HOM_CG
        self.cls = cls
        self.hets = (cls == HET).sum(axis=1)
        self.homs = ((cls == HOM_AT) | (cls == HOM_CG)).sum(axis=1)
        self.miss = (cls == UNKNOWN).sum(axis=1)

        self._min_cov = opts.min_cov
        self._s_single = None  # lazy: only the exact engine needs it

        # error rate (computeErrorRate, CompareCounts.hpp:1198-1217)
        n = self.n_samples
        err = np.full(n, -1.0)
        distinct_kmers = float(self.distinct.sum())
        sums = self.sum_counts.sum(axis=(1, 2)).astype(np.float64)
        for i in range(n):
            if self.raw_total_kmers[i] > 0 and self.ks[i] > 0:
                expected = (
                    float(self.raw_total_kmers[i]) * distinct_kmers / float(opts.genome_size)
                )
                err[i] = 1.0 - (sums[i] / expected) ** (1.0 / float(self.ks[i]))
        self.error_rate = err
        self.cov = self.total_counts.astype(np.float64) / float(self.n_sites)
        return self


def load_count_data(paths, opts: Options) -> CountData:
    from ntsm_tpu.io.countfile import load_count_arrays

    bulk = load_count_arrays(paths)
    if bulk is not None:
        locus_ids, distinct, mc, sc, tks, kss = bulk
        return CountData(
            filenames=list(paths),
            locus_ids=locus_ids,
            distinct=distinct,
            max_counts=mc,
            sum_counts=sc,
            raw_total_kmers=tks,
            ks=kss,
            total_counts=mc.sum(axis=(1, 2)),
        ).prepare(opts)

    locus_ids, distinct, files = load_count_files(paths)
    mc = np.stack([f.max_counts for f in files])
    sc = np.stack([f.sum_counts for f in files])
    data = CountData(
        filenames=list(paths),
        locus_ids=locus_ids,
        distinct=distinct,
        max_counts=mc,
        sum_counts=sc,
        raw_total_kmers=np.array([f.raw_total_kmers for f in files], dtype=np.int64),
        ks=np.array([f.k for f in files], dtype=np.int64),
        total_counts=np.array([f.total_counts for f in files], dtype=np.int64),
    )
    return data.prepare(opts)

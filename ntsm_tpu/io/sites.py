"""Site k-mer table construction from an interleaved site FASTA.

The site FASTA alternates a REF(AT) entry and a VAR(CG) entry per SNP site
(entries may hold several 'N'-separated k-mers).  The reference loads it
into a robin_map hash table keyed by canonical hash, records per-allele
k-mer lists, warns on cross-entry duplicate k-mers and (unless -d) removes
them (reference: src/FingerPrint.hpp:490-564).

Duplicate semantics replicated here:

* the FIRST occurrence of a k-mer claims it (joins that allele's list);
* later occurrences trigger the reference's exact warning text and mark
  the hash as a dupe;
* without ``dupes``: the hash is dropped from the lookup table.  NB the
  reference additionally leaves a dangling hash in the first allele's list,
  which makes its count printer throw (FingerPrint.hpp:275,282 calls .at()
  on an erased key) — i.e. the reference crashes on real duplicate input
  unless -d is given.  We instead drop the k-mer from the first allele's
  list too, which changes the distinct column only in inputs where the
  reference cannot run at all.
* with ``dupes``: the hash stays and only the first allele's list holds it,
  so a shared k-mer's counts are attributed to the first site that used it.

The result is a :class:`SiteTable` of dense arrays: hash list in insertion
order, per-k-mer site + allele indices, and a bucketed open-addressing
lookup table for the device kernels (the hash is already uniform, so its
low bits are the bucket address; no second hash needed).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from ntsm_tpu.core.kmers import canonical_hashes
from ntsm_tpu.io.fastx import read_fastx

EMPTY_KEY = np.uint64(0xFFFFFFFFFFFFFFFF)


@dataclass
class LookupTable:
    """Bucketed open-addressing table: bucket = hash & (n_buckets-1)."""

    keys: np.ndarray  # [n_buckets, slots] uint64, EMPTY_KEY where unused
    vals: np.ndarray  # [n_buckets, slots] int32 k-mer index (miss slot = n)
    n_buckets: int
    slots: int


@dataclass
class SiteTable:
    site_ids: list  # [n_sites] locus names
    kmer_hashes: np.ndarray  # [n_kmers] uint64, insertion order
    kmer_site: np.ndarray  # [n_kmers] int32
    kmer_allele: np.ndarray  # [n_kmers] uint8 (0 = REF/AT, 1 = VAR/CG)
    distinct: np.ndarray  # [n_sites, 2] int64 k-mers per allele
    k: int
    lookup: LookupTable = field(default=None)

    @property
    def n_sites(self) -> int:
        return len(self.site_ids)

    @property
    def n_kmers(self) -> int:
        return int(self.kmer_hashes.shape[0])


def build_lookup(hashes: np.ndarray, slots: int = 8) -> LookupTable:
    """Build the bucketed lookup table on the host (numpy)."""
    n = int(hashes.shape[0])
    n_buckets = 1
    target = max(2 * n, 16)
    while n_buckets * slots < target:
        n_buckets *= 2
    while True:
        bucket = (hashes & np.uint64(n_buckets - 1)).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        sb = bucket[order]
        # position within bucket
        counts = np.bincount(sb, minlength=n_buckets)
        if counts.max(initial=0) > slots:
            n_buckets *= 2
            continue
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(n) - starts[sb]
        keys = np.full((n_buckets, slots), EMPTY_KEY, dtype=np.uint64)
        vals = np.full((n_buckets, slots), n, dtype=np.int32)
        keys[sb, within] = hashes[order]
        vals[sb, within] = order.astype(np.int32)
        return LookupTable(keys=keys, vals=vals, n_buckets=n_buckets, slots=slots)


def load_site_table(path: str, k: int, allow_dupes: bool, err=sys.stderr) -> SiteTable:
    site_ids: list[str] = []
    hash_list: list[np.ndarray] = []
    site_of: list[np.ndarray] = []
    allele_of: list[np.ndarray] = []
    seen: dict[int, int] = {}  # hash -> global kmer index
    dupes: set[int] = set()
    n_kmers = 0

    for entry_num, rec in enumerate(read_fastx(path)):
        allele = entry_num % 2  # 0 = REF, 1 = VAR (FingerPrint.hpp:510)
        index = entry_num // 2
        if allele == 0:
            site_ids.append(rec.name)
        hashes, pos = canonical_hashes(rec.seq, k, with_pos=True)
        fresh_mask = np.ones(hashes.shape[0], dtype=bool)
        kind = "REF" if allele == 0 else "VAR"
        for j in range(hashes.shape[0]):
            hv = int(hashes[j])
            if hv in seen:
                # exact warning text: FingerPrint.hpp:521-523,542-544
                print(
                    f"Warning: {rec.name} of {kind} file has a k-mer "
                    f"collision at pos: {int(pos[j])}",
                    file=err,
                )
                dupes.add(hv)
                fresh_mask[j] = False
            else:
                seen[hv] = n_kmers
                n_kmers += 1
        fresh = hashes[fresh_mask]
        hash_list.append(fresh)
        site_of.append(np.full(fresh.shape[0], index, dtype=np.int32))
        allele_of.append(np.full(fresh.shape[0], allele, dtype=np.uint8))

    if len(hash_list) % 2 != 0:
        raise ValueError(f"{path}: interleaved site FASTA has an odd entry count")

    kmer_hashes = (
        np.concatenate(hash_list) if hash_list else np.zeros(0, dtype=np.uint64)
    )
    kmer_site = np.concatenate(site_of) if site_of else np.zeros(0, dtype=np.int32)
    kmer_allele = (
        np.concatenate(allele_of) if allele_of else np.zeros(0, dtype=np.uint8)
    )

    # insertion order is per-entry concatenation order == reference order
    if not allow_dupes and dupes:
        dup_arr = np.fromiter(dupes, dtype=np.uint64, count=len(dupes))
        keep = ~np.isin(kmer_hashes, dup_arr)
        kmer_hashes = kmer_hashes[keep]
        kmer_site = kmer_site[keep]
        kmer_allele = kmer_allele[keep]

    n_sites = len(site_ids)
    distinct = np.zeros((n_sites, 2), dtype=np.int64)
    if kmer_hashes.shape[0]:
        np.add.at(distinct, (kmer_site, kmer_allele.astype(np.int64)), 1)

    table = SiteTable(
        site_ids=site_ids,
        kmer_hashes=kmer_hashes,
        kmer_site=kmer_site,
        kmer_allele=kmer_allele,
        distinct=distinct,
        k=k,
    )
    table.lookup = build_lookup(kmer_hashes)
    return table

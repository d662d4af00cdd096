"""counts.txt codec — byte-compatible with the reference.

Writer replicates FingerPrint::printOptionalHeader/printCountsMax
(src/FingerPrint.hpp:261-311), MultiCount::printCountsMax
(src/MultiCount.hpp:93-138, which omits the #@ header lines) and
CompareCounts::mergeCounts (src/CompareCounts.hpp:626-674).

Reader replicates the CompareCounts constructor (src/CompareCounts.hpp:30-114):
the first file fixes the locus order and the distinct columns; every file's
rows are matched by locusID; a file's coverage total is the sum of its
max-count columns.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np


def format_counts(
    site_ids,
    max_counts: np.ndarray,  # [n_sites, 2]
    sum_counts: np.ndarray,  # [n_sites, 2]
    distinct: np.ndarray,  # [n_sites, 2]
    total_kmers: int | None,
    k: int | None,
) -> str:
    """Render a counts file. total_kmers/k None => no #@ header (ntsmVCF)."""
    parts: list[str] = []
    if total_kmers is not None:
        parts.append(f"#@TK\t{int(total_kmers)}\n#@KS\t{int(k)}")
    parts.append("\n#locusID\tcountAT\tcountCG\tsumAT\tsumCG\tdistinctAT\tdistinctCG\n")
    mc = np.asarray(max_counts)
    sc = np.asarray(sum_counts)
    dc = np.asarray(distinct)
    for i, sid in enumerate(site_ids):
        parts.append(
            f"{sid}\t{int(mc[i,0])}\t{int(mc[i,1])}\t{int(sc[i,0])}\t{int(sc[i,1])}"
            f"\t{int(dc[i,0])}\t{int(dc[i,1])}\n"
        )
    return "".join(parts)


def format_merged_counts(site_ids, max_counts, sum_counts, distinct, total_kmers, k) -> str:
    """mergeCounts layout: #@ header then table, no leading blank line
    (src/CompareCounts.hpp:639-644)."""
    body = format_counts(site_ids, max_counts, sum_counts, distinct, None, None)
    return f"#@TK\t{int(total_kmers)}\n#@KS\t{int(k)}{body}"


@dataclass
class CountFile:
    path: str
    max_counts: np.ndarray  # [n_sites, 2] int64 (countAT, countCG)
    sum_counts: np.ndarray  # [n_sites, 2] int64 (sumAT, sumCG)
    raw_total_kmers: int  # #@TK, 0 if absent
    k: int  # #@KS, 0 if absent
    total_counts: int  # sum of max_counts (src/CompareCounts.hpp:104-106)


def _parse_rows(path: str):
    tk = 0
    ks = 0
    rows = []
    with open(path, "r") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            fields = line.split("\t")
            if line[0] == "#":
                if fields[0] == "#@TK":
                    tk = int(fields[1])
                elif fields[0] == "#@KS":
                    ks = int(fields[1])
                continue
            rows.append(fields)
    return tk, ks, rows


def load_count_files(paths) -> tuple[list, np.ndarray, list[CountFile]]:
    """Load count files the way CompareCounts does.

    Returns (locus_ids, distinct[n_sites,2], [CountFile...]).
    """
    tk0, ks0, rows0 = _parse_rows(paths[0])
    locus_ids = [r[0] for r in rows0]
    index_of = {lid: i for i, lid in enumerate(locus_ids)}
    distinct = np.array([[int(r[5]), int(r[6])] for r in rows0], dtype=np.int64)
    n = len(locus_ids)

    out = []
    for path in paths:
        tk, ks, rows = _parse_rows(path)
        mc = np.zeros((n, 2), dtype=np.int64)
        sc = np.zeros((n, 2), dtype=np.int64)
        for r in rows:
            i = index_of[r[0]]  # unknown locus raises, like .at() would
            mc[i, 0] = int(r[1])
            mc[i, 1] = int(r[2])
            sc[i, 0] = int(r[3])
            sc[i, 1] = int(r[4])
        out.append(
            CountFile(
                path=path,
                max_counts=mc,
                sum_counts=sc,
                raw_total_kmers=tk,
                k=ks,
                total_counts=int(mc.sum()),
            )
        )
    return locus_ids, distinct, out

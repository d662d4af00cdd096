"""Multi-sample VCF -> synthetic count matrix / PCA training matrix.

Replaces VCFConvert + MultiCount (src/VCFConvert.hpp, src/MultiCount.hpp):
instead of a CAS-guarded uint8 matrix filled k-mer-by-k-mer, we map each
site window's k-mers to site-table indices once and fill a dense
[n_samples, n_kmers] uint8 matrix with vectorized writes.

Semantics preserved:

* genotype parsing "0|0"->hom-ref, "0|1"/"1|0"->het, "1|1"->hom-alt, and —
  faithfully to the reference's value-initialized enum (VCFConvert.hpp:138)
  — any OTHER genotype string (./., unphased 0/1, ...) counts as hom-ref.
* counts are multi*2 for hom, multi for het (:151-170), stored uint8 with
  the same wraparound for multi > 127.
* first write wins per (sample, k-mer); a differing later write emits the
  reference's "Inconsistent k-mer counts" warning (MultiCount.hpp:51-68).
  Rows are processed in file order, so results match a -t 1 reference run.
* non-SNP rows skipped: REF == "." or len(ALT) != 1 (:122-129); REF length
  itself is (quirkily) not checked, as in the reference.
* windows of opt::window bp centered at pos, variant base substituted at
  window/2 (getSeqFromSite, :207-218).
* the PCA matrix writer reproduces printNormMatrix (MultiCount.hpp:148-203)
  including its sticky setprecision(19) after the first missing value and
  the long-double center file.
"""

from __future__ import annotations

import sys

import numpy as np

from ntsm_tpu.core.kmers import canonical_hashes
from ntsm_tpu.io.fastx import read_fastx
from ntsm_tpu.io.sites import SiteTable
from ntsm_tpu.options import Options

HOM1, HET, HOM2 = 0, 1, 2


def _format_longdouble_g(x: np.longdouble, precision: int = 19) -> str:
    """printf %.19Lg for numpy longdouble."""
    if np.isnan(x):
        return "-nan" if np.signbit(x) else "nan"
    if np.isinf(x):
        return "-inf" if x < 0 else "inf"
    if x == 0:
        return "0"
    # C's %g picks fixed vs scientific from the exponent of the value
    # AFTER rounding to `precision` significant digits (9.99...e-5 at 19
    # digits rounds to 1e-4 and prints FIXED) — so take the exponent
    # from the rounded scientific form, not floor(log10(x))
    s = np.format_float_scientific(
        x, precision=precision - 1, unique=False, trim="-"
    )
    mant, e = s.split("e")
    exp = int(e)
    if exp < -4 or exp >= precision:
        # normalize exponent format to C's e+05 style
        return f"{mant}e{'+' if exp >= 0 else '-'}{abs(exp):02d}"
    return np.format_float_positional(
        x, precision=precision, unique=False, fractional=False, trim="-"
    )


def _format_double_g(x: float, precision: int) -> str:
    """C++ `stream << double` at the stream's current precision (%g)."""
    return f"{float(x):.{precision}g}"


class VCFConverter:
    def __init__(self, table: SiteTable, opts: Options, err=sys.stderr):
        self.table = table
        self.opts = opts
        self.err = err
        if opts.verbose > 1:
            print(f"Loading Reference {opts.ref}", file=err)
        self.ref = {rec.name: rec.seq.upper() for rec in read_fastx(opts.ref)}
        self.sample_ids: list[str] = []
        self.mat: np.ndarray | None = None  # [n_samples, n_kmers] uint8
        self.hash_to_idx = {
            int(h): i for i, h in enumerate(table.kmer_hashes)
        }
        # per-site k-mer index lists, per allele
        self.site_kmers = [[[], []] for _ in range(table.n_sites)]
        for idx in range(table.n_kmers):
            s = int(table.kmer_site[idx])
            a = int(table.kmer_allele[idx])
            self.site_kmers[s][a].append(idx)

    def _window(self, chrom: str, pos: int, var: str) -> tuple[bytes, bytes]:
        w = self.opts.window
        seq = self.ref[chrom]
        offset = pos - w // 2 - 1
        if offset < 0 or offset + w > len(seq):
            raise IndexError(
                f"window for {chrom}:{pos} out of reference bounds "
                "(the reference tool reads out of bounds here)"
            )
        ref_win = seq[offset : offset + w]
        var_win = ref_win[: w // 2] + var.encode("ascii") + ref_win[w // 2 + 1 :]
        return ref_win, var_win

    def _insert(self, kmer_idx: int, sample_sel: np.ndarray, value: int):
        """First-write-wins insert with the reference's warning."""
        col = self.mat[:, kmer_idx]
        existing = col[sample_sel]
        conflict = (existing > 0) & (existing != value)
        if conflict.any():
            old = int(existing[conflict][0])
            print(
                "Warning: Inconsistent k-mer counts, check for overlapping "
                f"sites: {old} vs {value}",
                file=self.err,
            )
        write = sample_sel.copy()
        write[sample_sel] = existing == 0
        col[write] = value

    def _parse_genotypes(self, tail: str, n: int) -> np.ndarray:
        """[n] genotype codes from the tab-joined sample columns.

        Fast path: every field is a 3-char phased genotype (the 1000
        Genomes layout) — parsed as one byte array instead of a 3202-wide
        Python loop (~300M iterations for the full cohort).  Reference
        semantics: only the exact strings 0|0 / 0|1 / 1|0 / 1|1 classify;
        anything else defaults to hom-ref (VCFConvert.hpp:139-148)."""
        gts = np.zeros(n, dtype=np.int8)  # default hom1 (quirk)
        raw = tail.encode("ascii", "replace")
        if len(raw) == 4 * n - 1:
            b = np.frombuffer(b"\t" + raw, dtype=np.uint8).reshape(n, 4)
            if not (b[:, 0] == 9).all():
                # mixed-width fields that happen to sum to 4n-1 (FORMAT
                # subfields, haploid chrX calls): misaligned — use the
                # exact per-field loop.  With n-1 tabs all landing on
                # stride-4 positions, every field IS 3 chars, so this
                # check makes the fast path exact.
                b = None
        else:
            b = None
        if b is not None:
            ok = (
                ((b[:, 1] == 48) | (b[:, 1] == 49))
                & (b[:, 2] == 124)
                & ((b[:, 3] == 48) | (b[:, 3] == 49))
            )
            a1 = b[:, 1] == 49
            a2 = b[:, 3] == 49
            gts[ok & ~a1 & ~a2] = HOM1
            gts[ok & (a1 ^ a2)] = HET
            gts[ok & a1 & a2] = HOM2
            return gts
        for s, g in enumerate(tail.split("\t")[:n]):
            if g == "0|0":
                gts[s] = HOM1
            elif g in ("0|1", "1|0"):
                gts[s] = HET
            elif g == "1|1":
                gts[s] = HOM2
        return gts

    def count(self, vcf_path: str) -> None:
        opts = self.opts
        if opts.verbose > 1:
            print(f"Reading VCF file: {vcf_path}", file=self.err)
        multi = opts.multi & 0xFF
        multi2 = (opts.multi * 2) & 0xFF
        k = opts.k

        with open(vcf_path) as fh:
            for line in fh:
                if line.startswith("#"):
                    if line.startswith("#CHROM"):
                        self.sample_ids = line.rstrip("\n").split("\t")[9:]
                        break
            if opts.verbose > 1:
                print(
                    f"Starting multicount of each rsID for "
                    f"{len(self.sample_ids)} samples.",
                    file=self.err,
                )
            n = len(self.sample_ids)
            self.mat = np.zeros((n, self.table.n_kmers), dtype=np.uint8)
            for line in fh:
                fields = line.rstrip("\n").split("\t", 9)
                if len(fields) < 10:
                    continue
                chrom, pos_s, rsid, ref_col, alt = fields[:5]
                if opts.verbose > 2:
                    print(f"Processing site: {rsid}", file=self.err)
                if ref_col == ".":
                    continue
                if len(alt) != 1:
                    continue
                ref_win, var_win = self._window(chrom, int(pos_s), alt)
                gts = self._parse_genotypes(fields[9], n)
                hom1_sel = gts == HOM1
                het_sel = gts == HET
                hom2_sel = gts == HOM2
                for h in canonical_hashes(ref_win, k):
                    idx = self.hash_to_idx.get(int(h))
                    if idx is not None:
                        self._insert(idx, hom1_sel, multi2)
                        self._insert(idx, het_sel, multi)
                for h in canonical_hashes(var_win, k):
                    idx = self.hash_to_idx.get(int(h))
                    if idx is not None:
                        self._insert(idx, hom2_sel, multi2)
                        self._insert(idx, het_sel, multi)

    # ---- outputs ----

    def site_max_matrix(self) -> tuple[np.ndarray, np.ndarray]:
        """Per (sample, site, allele) max and sum of the k-mer counts."""
        n = len(self.sample_ids)
        L = self.table.n_sites
        mx = np.zeros((n, L, 2), dtype=np.int64)
        sm = np.zeros((n, L, 2), dtype=np.int64)
        if self.table.n_kmers:
            sites = self.table.kmer_site
            alleles = self.table.kmer_allele.astype(np.int64)
            for s in range(n):
                np.maximum.at(mx[s], (sites, alleles), self.mat[s])
                np.add.at(sm[s], (sites, alleles), self.mat[s])
        return mx, sm

    def output_counts(self, out_dir: str = ".") -> None:
        """Per-sample count files, MultiCount::printCountsMax layout (no #@
        header).  NB the reference CLI never invokes this without -p
        (src/ntSeqMatchVCF.cpp:201-204); exposed here as API + --output-counts."""
        import os

        from ntsm_tpu.io.countfile import format_counts

        mx, sm = self.site_max_matrix()
        for s, sid in enumerate(self.sample_ids):
            path = os.path.join(out_dir, f"{sid}.counts.txt")
            with open(path, "w") as fh:
                fh.write(
                    format_counts(
                        self.table.site_ids, mx[s], sm[s], self.table.distinct, None, None
                    )
                )

    def output_matrix(self, prefix: str) -> None:
        """PCA training matrix + center file (printNormMatrix,
        src/MultiCount.hpp:148-203)."""
        mx, _ = self.site_max_matrix()
        n = len(self.sample_ids)
        if n == 0:
            raise SystemExit(
                "ntsm vcf: the VCF has no sample columns - the PCA training "
                "matrix needs a multi-sample VCF (e.g. 1000 Genomes)"
            )
        with open(prefix + "_matrix.tsv", "w") as out, open(
            prefix + "_center.txt", "w"
        ) as centerf:
            out.write("alleleID")
            for sid in self.sample_ids:
                out.write("\t" + sid)
            out.write("\n")
            precision = 6  # default ostream precision; sticky 19 after UNDEF
            for i, site_id in enumerate(self.table.site_ids):
                max_ref = mx[:, i, 0].astype(np.float64)
                max_var = mx[:, i, 1].astype(np.float64)
                denom = max_ref + max_var
                present = denom > 0
                with np.errstate(divide="ignore", invalid="ignore"):
                    values = np.where(present, max_ref / np.maximum(denom, 1.0), 0.0)
                # cumsum, not sum: np.sum's pairwise tree differs from
                # the reference's sequential `sum += values[j]` double
                # accumulation (MultiCount.hpp:159-200) in the last ulp
                # for >8 samples — visible at %.19Lg on nearly every row
                # at cohort scale.  add.accumulate is strictly
                # left-to-right, and absent samples hold exact +0.0
                # (bitwise-neutral to add), so the final element equals
                # the reference's loop bit-for-bit.
                ssum = float(values.cumsum()[-1]) if n else 0.0
                center = np.longdouble(ssum) / np.longdouble(n)
                out.write(site_id)
                for j in range(n):
                    if not present[j]:
                        precision = 19  # setprecision is sticky (:194)
                        out.write("\t" + _format_longdouble_g(center, 19))
                    else:
                        out.write("\t" + _format_double_g(values[j], precision))
                centerf.write(_format_longdouble_g(center, 19) + "\n")
                out.write("\n")

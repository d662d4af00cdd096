"""Generate byte-parity fixtures by running the reference ntsm binaries.

Run manually when the reference toolchain is available:

    python tests/make_fixtures.py /tmp/ntsm_ref

Produces tests/fixtures/: synthetic site FASTA, per-sample FASTQs, the
reference's counts.txt / summary.tsv outputs (ntsmCount -t 1 for
deterministic read order) and eval outputs for several flag combinations.
The fixtures are committed, so the test suite never needs the C++ binaries.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tests.synth import make_sample_reads, make_site_fasta  # noqa: E402

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"


def sh(cmd, stdout=None, **kw):
    print("+", " ".join(map(str, cmd)), file=sys.stderr)
    kw.setdefault("cwd", FIXTURES)
    if stdout:
        with open(stdout, "wb") as out:
            r = subprocess.run(cmd, stdout=out, stderr=subprocess.PIPE, **kw)
    else:
        r = subprocess.run(cmd, capture_output=True, **kw)
    if r.returncode != 0:
        sys.stderr.buffer.write(r.stderr)
        raise SystemExit(f"command failed: {cmd}")
    return r


def main(ref_dir: str):
    ref = pathlib.Path(ref_dir)
    ntsm_count = ref / "ntsmCount"
    ntsm_eval = ref / "ntsmEval"
    FIXTURES.mkdir(exist_ok=True)

    rng = np.random.default_rng(20260816)
    n_sites = 40
    sites_fa = FIXTURES / "sites.fa"
    _, sites = make_site_fasta(rng, n_sites=n_sites, path=str(sites_fa))

    # samples: A and A2 share genotypes (same origin, different reads);
    # B is unrelated; C is A-like for half the sites (pseudo-related).
    g_a = rng.integers(0, 3, size=n_sites)
    g_b = rng.integers(0, 3, size=n_sites)
    g_c = np.where(np.arange(n_sites) % 2 == 0, g_a, g_b)
    samples = {
        "sampleA": (g_a, 8, 0.001),
        "sampleA2": (g_a, 12, 0.002),
        "sampleB": (g_b, 10, 0.001),
        "sampleC": (g_c, 9, 0.001),
    }
    count_files = []
    for name, (gt, cov, er) in samples.items():
        fq = FIXTURES / f"{name}.fq"
        make_sample_reads(rng, sites, gt, coverage=cov, error_rate=er, path=str(fq))
        counts = FIXTURES / f"{name}_counts.txt"
        r = sh(
            [ntsm_count, "-t", "1", "-s", "sites.fa", f"{name}.fq"],
            stdout=counts,
        )
        (FIXTURES / f"{name}_count_stderr.txt").write_bytes(r.stderr)
        count_files.append(counts.name)

    # low-coverage / missing-sites sample for miss handling
    g_low = rng.integers(0, 3, size=n_sites)
    fq = FIXTURES / "sampleLow.fq"
    make_sample_reads(
        rng, sites[: n_sites // 2], g_low[: n_sites // 2], coverage=3, path=str(fq)
    )
    counts = FIXTURES / "sampleLow_counts.txt"
    sh([ntsm_count, "-t", "1", "-s", "sites.fa", "sampleLow.fq"], stdout=counts)
    count_files.append(counts.name)

    # early-termination run (deterministic with -t 1)
    sh(
        [ntsm_count, "-t", "1", "-m", "2", "-s", "sites.fa", "sampleA.fq"],
        stdout=FIXTURES / "sampleA_m2_counts.txt",
    )

    # kseq header-hunt fixture (vendor/kseq.h:182-186,216): junk bytes
    # before the first record and between FASTQ records are silently
    # skipped by the reference's parser
    reads_a = (FIXTURES / "sampleA.fq").read_text().splitlines(keepends=True)
    half = (len(reads_a) // 8) * 4  # split on a record boundary
    (FIXTURES / "sampleA_junk.fq").write_text(
        "; leading garbage the parser must hunt past\n"
        "second junk line\n"
        + "".join(reads_a[:half])
        + "-- inter-record divider --\n"
        + "".join(reads_a[half:])
    )
    sh(
        [ntsm_count, "-t", "1", "-s", "sites.fa", "sampleA_junk.fq"],
        stdout=FIXTURES / "sampleA_junk_counts.txt",
    )

    # kseq -2 fixture: a record whose quality length mismatches its
    # sequence makes kseq_read return -2, ending the reference's per-file
    # `while (kseq_read(seq) >= 0)` loop — reads after the bad record are
    # never counted
    (FIXTURES / "sampleA_badqual.fq").write_text(
        "".join(reads_a[:half])
        + "@bad\nACGT\n+\nIIIIIIIIII\n"
        + "".join(reads_a[half:])
    )
    sh(
        [ntsm_count, "-t", "1", "-s", "sites.fa", "sampleA_badqual.fq"],
        stdout=FIXTURES / "sampleA_badqual_counts.txt",
    )

    # synthetic PCA rotation + center files (contents arbitrary; eval just
    # loads them — parity only needs both tools to read identical files)
    rot = FIXTURES / "rotation.tsv"
    center = FIXTURES / "center.txt"
    dims = 5
    rvals = rng.normal(0, 0.3, size=(n_sites, dims))
    with open(rot, "w") as fh:
        fh.write("AlleleID\t" + "\t".join(str(d) for d in range(dims)) + "\n")
        for i in range(n_sites):
            fh.write(
                f"rs{100000+i}\t" + "\t".join(f"{v:.17g}" for v in rvals[i]) + "\n"
            )
    with open(center, "w") as fh:
        for i in range(n_sites):
            fh.write(f"{rng.random() * 0.9 + 0.05:.17g}\n")

    # ---- eval fixtures ----
    evals = {
        "eval_default.tsv": [],
        "eval_all.tsv": ["-a"],
        "eval_all_c2.tsv": ["-a", "-c", "2"],
        "eval_all_noskew.tsv": ["-a", "-w", "0"],
        "eval_all_g.tsv": ["-a", "-g", "80000"],
        "eval_pca.tsv": ["-a", "-d", str(dims), "-p", "rotation.tsv", "-n", "center.txt"],
    }
    for out, flags in evals.items():
        sh([ntsm_eval, "-t", "1", *flags, *count_files], stdout=FIXTURES / out)

    # single-file QC (with and without PCA projection)
    sh([ntsm_eval, "-t", "1", count_files[0]], stdout=FIXTURES / "eval_single.tsv")
    sh(
        [ntsm_eval, "-t", "1", "-d", str(dims), "-p", "rotation.tsv",
         "-n", "center.txt", count_files[0]],
        stdout=FIXTURES / "eval_single_pca.tsv",
    )

    # merge
    sh(
        [ntsm_eval, "-t", "1", "-o", "-e", "merged_counts.txt",
         count_files[0], count_files[1]],
        stdout=FIXTURES / "eval_merge_stdout.txt",
    )

    # -b debug-recall fixture (CompareCounts.hpp:392-527): ground-truth
    # same-origin groups.  The reference iterates a robin_set, so row
    # ORDER is hash/build-dependent; the parity test compares the sorted
    # row multiset (we emit insertion order).
    (FIXTURES / "debug_groups.txt").write_text(
        "sampleA_counts.txt sampleA2_counts.txt\n"
        "sampleB_counts.txt sampleC_counts.txt sampleLow_counts.txt\n"
    )
    sh(
        [ntsm_eval, "-t", "1", "-d", str(dims), "-p", "rotation.tsv",
         "-n", "center.txt", "-b", "debug_groups.txt", *count_files],
        stdout=FIXTURES / "eval_debug.tsv",
    )

    make_vcf_world(rng, ref / "ntsmVCF")
    print("fixtures written to", FIXTURES, file=sys.stderr)


def make_vcf_world(rng, ntsm_vcf):
    """Genome + multi-sample VCF + matching site FASTA; reference ntsmVCF -p
    output as the parity fixture for the PCA matrix/center files.

    NB: shipped ntsm v1.2.1 ntsmVCF segfaults on ANY data row —
    MultiCount::m_matCounts is sized in the constructor while the
    referenced sample-ID vector is still empty (src/MultiCount.hpp:278 via
    src/VCFConvert.hpp:42), so every insert is out of bounds (verified with
    ASan: SEGV at MultiCount.hpp:55).  The oracle build in /tmp is patched
    to size the matrix after the #CHROM header is parsed; these fixtures
    therefore capture the reference's *intended* output.

    The exact oracle patch (applied to a COPY of the reference source):

      * MultiCount.hpp, in the public section:
            void resizeForSamples() {
                m_matCounts = vector<uint8_t>(
                    m_kmerToHash.size() * m_sampleIDs.size(), 0);
            }
      * VCFConvert.hpp, right after the #CHROM header parse (before the
        'Starting multicount' verbose print):
            m_counts.resizeForSamples(); // oracle patch

    Build each tool with:
      g++ -O2 -std=c++11 -fopenmp -I. -Isrc -Ivendor \
          src/<tool>.cpp src/Options.cpp -lz -o <tool>
    after writing a stub config.h defining PACKAGE_NAME/VERSION/
    PACKAGE_VERSION/PACKAGE_STRING/PACKAGE_BUGREPORT/GIT_REVISION
    (do NOT link vendor/kfunc.c into ntsmEval; it is already inlined).

    Verified 2026-08-16: regenerating against freshly built binaries
    reproduces every fixture byte-for-byte except the self-reported
    Time/Memory stderr lines."""
    from tests.synth import random_genome

    w, k = 31, 19
    glen = 2000
    genome = bytearray(random_genome(rng, glen))
    n_sites = 12
    positions = [120 + 60 * i for i in range(n_sites)]  # 1-based SNP pos
    at, cg = b"AT", b"CG"
    rows = []
    fa_entries = []
    n_samples = 6
    sample_ids = [f"S{i}" for i in range(n_samples)]
    for s_i, pos in enumerate(positions):
        ref_base = genome[pos - 1]
        if chr(ref_base) in "AT":
            alt = chr(cg[rng.integers(0, 2)])
            at_is_ref = True
        else:
            alt = chr(at[rng.integers(0, 2)])
            at_is_ref = False
        off = pos - w // 2 - 1
        ref_win = bytes(genome[off : off + w])
        var_win = ref_win[: w // 2] + alt.encode() + ref_win[w // 2 + 1 :]
        at_win, cg_win = (ref_win, var_win) if at_is_ref else (var_win, ref_win)
        name = f"rsv{s_i}"
        fa_entries.append(f">{name} ref\n{at_win.decode()}\n>{name} var\n{cg_win.decode()}\n")
        if s_i == 5:
            # non-SNP row (multi-base ALT): skipped by the converter, so
            # this site ends all-missing -> exercises the sticky
            # setprecision(19) path of printNormMatrix
            rows.append(
                f"chr1\t{pos}\t{name}\t{chr(ref_base)}\tAC\t.\t.\t.\tGT\t"
                + "\t".join(["0|0"] * n_samples)
            )
            continue
        gts = []
        for _ in range(n_samples):
            gts.append(rng.choice(["0|0", "0|1", "1|0", "1|1", "./."]))
        rows.append(
            f"chr1\t{pos}\t{name}\t{chr(ref_base)}\t{alt}\t.\t.\t.\tGT\t" + "\t".join(gts)
        )
    (FIXTURES / "vcf_genome.fa").write_text(">chr1\n" + bytes(genome).decode() + "\n")
    (FIXTURES / "vcf_sites.fa").write_text("".join(fa_entries))
    vcf = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
    vcf += "\t".join(sample_ids) + "\n" + "\n".join(rows) + "\n"
    (FIXTURES / "multi.vcf").write_text(vcf)
    r = sh(
        [ntsm_vcf, "-t", "1", "-k", str(k), "-w", str(w), "-p", "vcfout",
         "-s", "vcf_sites.fa", "-r", "vcf_genome.fa", "multi.vcf"],
    )
    (FIXTURES / "vcf_stderr.txt").write_bytes(r.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ntsm_ref")

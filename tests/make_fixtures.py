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
    print("fixtures written to", FIXTURES, file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ntsm_ref")

"""Synthetic genomes / site FASTAs / reads for tests and benchmarks."""

from __future__ import annotations

import gzip

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65, 78: 78}  # A<->T C<->G N->N


def random_genome(rng, n: int) -> bytes:
    return BASES[rng.integers(0, 4, size=n)].tobytes()


def revcomp(seq: bytes) -> bytes:
    return bytes(COMP[b] for b in reversed(seq))


def make_site_fasta(
    rng, n_sites: int, window: int = 31, k: int = 19, path: str | None = None
) -> tuple[str, list[dict]]:
    """Interleaved REF/VAR site FASTA like the ntsmSiteGen output:
    per site, sub-k-mers joined by 'N' (filterRepetiveSNP.pl:46,62)."""
    out = []
    sites = []
    half = window // 2
    for i in range(n_sites):
        while True:
            win = bytearray(random_genome(rng, window))
            ref_base = win[half]
            # AT<->CG variant only (extractSNPsfromVCF.py:52-62 default)
            if chr(ref_base) in "AT":
                var_base = ord(rng.choice(["C", "G"]))
                at_is_ref = True
            else:
                var_base = ord(rng.choice(["A", "T"]))
                at_is_ref = False
            ref_win = bytes(win)
            var_win = bytes(win[:half]) + bytes([var_base]) + bytes(win[half + 1 :])
            # AT allele first in the file (sitegen orders AT then CG)
            at_win, cg_win = (ref_win, var_win) if at_is_ref else (var_win, ref_win)
            n_sub = window - k + 1
            at_kmers = [at_win[p : p + k] for p in range(n_sub)]
            cg_kmers = [cg_win[p : p + k] for p in range(n_sub)]
            break
        name = f"rs{100000 + i}"
        out.append(f">{name} ref\n" + b"N".join(at_kmers).decode() + "\n")
        out.append(f">{name} var\n" + b"N".join(cg_kmers).decode() + "\n")
        sites.append(
            {"name": name, "at_win": at_win, "cg_win": cg_win, "window": window}
        )
    text = "".join(out)
    if path:
        with open(path, "w") as fh:
            fh.write(text)
    return text, sites


def make_sample_reads(
    rng,
    sites: list[dict],
    genotypes,  # per site: 0 = hom AT, 1 = het, 2 = hom CG
    coverage: int,
    read_len: int = 100,
    error_rate: float = 0.0,
    path: str | None = None,
    gz: bool = False,
    n_noise_reads: int = 50,
) -> str:
    """Simulate a sample with a per-site genotype vector."""
    reads = []
    for s, g in zip(sites, genotypes):
        for c in range(coverage):
            if g == 0:
                win = s["at_win"]
            elif g == 2:
                win = s["cg_win"]
            else:
                win = s["at_win"] if c % 2 == 0 else s["cg_win"]
            flank = max(0, (read_len - len(win)) // 2)
            read = bytearray(
                random_genome(rng, flank) + win + random_genome(rng, flank)
            )
            if error_rate > 0:
                n_err = rng.binomial(len(read), error_rate)
                for p in rng.integers(0, len(read), size=n_err):
                    read[p] = BASES[rng.integers(0, 4)]
            if rng.random() < 0.5:
                read = bytearray(revcomp(bytes(read)))
            reads.append(bytes(read))
    for _ in range(n_noise_reads):
        reads.append(random_genome(rng, read_len))
    order = rng.permutation(len(reads))
    chunks = []
    for i, j in enumerate(order):
        q = "I" * len(reads[j])
        chunks.append(f"@read{i}\n{reads[j].decode()}\n+\n{q}\n")
    text = "".join(chunks)
    if path:
        if gz:
            with gzip.open(path, "wt") as fh:
                fh.write(text)
        else:
            with open(path, "w") as fh:
                fh.write(text)
    return text


def make_reads_fastq(
    rng,
    sites: list[dict],
    coverage: int,
    read_len: int = 100,
    error_rate: float = 0.0,
    genotype: str = "het",
    path: str | None = None,
    gz: bool = False,
    n_noise_reads: int = 50,
) -> str:
    """Simulate reads overlapping the site windows plus random noise reads."""
    reads = []
    for s in sites:
        for c in range(coverage):
            if genotype == "het":
                win = s["at_win"] if c % 2 == 0 else s["cg_win"]
            elif genotype == "at":
                win = s["at_win"]
            else:
                win = s["cg_win"]
            # embed the window in random flanks
            flank = max(0, (read_len - len(win)) // 2)
            read = bytearray(
                random_genome(rng, flank) + win + random_genome(rng, flank)
            )
            if error_rate > 0:
                n_err = rng.binomial(len(read), error_rate)
                for p in rng.integers(0, len(read), size=n_err):
                    read[p] = BASES[rng.integers(0, 4)]
            if rng.random() < 0.5:
                read = bytearray(revcomp(bytes(read)))
            reads.append(bytes(read))
    for _ in range(n_noise_reads):
        reads.append(random_genome(rng, read_len))
    order = rng.permutation(len(reads))
    chunks = []
    for i, j in enumerate(order):
        q = "I" * len(reads[j])
        chunks.append(f"@read{i}\n{reads[j].decode()}\n+\n{q}\n")
    text = "".join(chunks)
    if path:
        if gz:
            with gzip.open(path, "wt") as fh:
                fh.write(text)
        else:
            with open(path, "w") as fh:
                fh.write(text)
    return text

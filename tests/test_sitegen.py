"""End-to-end sitegen pipeline: VCF + genome -> tiered site FASTAs ->
counting -> eval, plus PCA training from a multi-VCF."""

import io
import pathlib

import numpy as np
import pytest

from ntsm_tpu.options import Options
from ntsm_tpu.sitegen.pipeline import (
    extract_candidates,
    generate_pca_rotation,
    generate_sites,
)
from tests.synth import random_genome


def make_world(rng, tmp_path, n_sites=10, glen=4000):
    genome = bytearray(random_genome(rng, glen))
    positions = []
    rows = []
    p = 100
    i = 0
    while len(positions) < n_sites and p < glen - 100:
        ref_base = chr(genome[p - 1])
        if ref_base in "AT":
            alt = rng.choice(["C", "G"])
        else:
            alt = rng.choice(["A", "T"])
        rows.append(f"chr1\t{p}\trs{i}\t{ref_base}\t{alt}\t.\t.\t.")
        positions.append(p)
        p += 97
        i += 1
    ref_path = tmp_path / "genome.fa"
    ref_path.write_text(">chr1\n" + bytes(genome).decode() + "\n")
    vcf_path = tmp_path / "snps.vcf"
    vcf_path.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        + "\n".join(rows)
        + "\n"
    )
    return ref_path, vcf_path, positions


def test_extract_candidates(rng, tmp_path):
    ref_path, vcf_path, positions = make_world(rng, tmp_path)
    err = io.StringIO()
    sites = extract_candidates(str(vcf_path), str(ref_path), err=err)
    assert len(sites) == len(positions)
    # every retained sub-k-mer overlaps the SNP and windows are 31bp
    for s in sites:
        assert len(s.at_win) == 31 and len(s.cg_win) == 31
        assert s.at_win != s.cg_win
    assert "Processed" in err.getvalue()


def test_generate_sites_and_count_roundtrip(rng, tmp_path):
    ref_path, vcf_path, _ = make_world(rng, tmp_path)
    import os

    os.chdir(tmp_path)
    sites = generate_sites("world", str(ref_path), str(vcf_path))
    tiers = sorted(tmp_path.glob("world_n*.fa"))
    assert len(tiers) == 13  # window 31, k 19 -> n in 0..12
    # tier files are nested: every site in n_i appears in n_{i+1}
    sizes = [t.stat().st_size for t in tiers]
    assert sizes == sorted(sizes)

    from ntsm_tpu.count.golden import count_files
    from ntsm_tpu.io.sites import load_site_table

    table = load_site_table(str(tiers[-1]), k=19, allow_dupes=False)
    assert table.n_sites > 0

    # simulate a het sample over those sites and verify counting sees both
    site_info = [
        {"name": s.snp_id, "at_win": s.at_win, "cg_win": s.cg_win}
        for s in sorted(sites, key=lambda s: s.snp_id)
        if s.at_kmers and s.cg_kmers
    ]
    from tests.synth import make_reads_fastq

    fq = tmp_path / "reads.fq"
    make_reads_fastq(rng, site_info, coverage=6, path=str(fq))
    res = count_files(table, [str(fq)])
    mx, _ = res.site_max_sum(table)
    assert (mx > 0).all()


def test_generate_pca_rotation(rng, tmp_path):
    import os

    ref_path, vcf_path, positions = make_world(rng, tmp_path, n_sites=8)
    os.chdir(tmp_path)
    generate_sites("pw", str(ref_path), str(vcf_path))
    # multi-sample VCF over the same sites
    n_samples = 12
    lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"S{i}" for i in range(n_samples)),
    ]
    for row in vcf_path.read_text().splitlines():
        if row.startswith("#"):
            continue
        gts = "\t".join(
            rng.choice(["0|0", "0|1", "1|0", "1|1"]) for _ in range(n_samples)
        )
        lines.append(row + "\tGT\t" + gts)
    mv = tmp_path / "multi.vcf"
    mv.write_text("\n".join(lines) + "\n")

    generate_pca_rotation(
        "pw", str(ref_path), str(mv), str(tmp_path / "pw_n12.fa"), dims=4
    )
    rot = (tmp_path / "pw_rotationalMatrix.tsv").read_text().splitlines()
    assert rot[0].split("\t")[0] == "AlleleID"
    assert len(rot[0].split("\t")) == 5  # AlleleID + 4 components

    # the produced rotation+center must be loadable by the eval PCA path
    from ntsm_tpu.eval.pca import load_norm_values, load_rotation

    norm = load_norm_values(str(tmp_path / "pw_center.txt"))
    r = load_rotation(str(tmp_path / "pw_rotationalMatrix.tsv"), norm.shape[0])
    assert r.shape[0] == 4

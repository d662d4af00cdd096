"""Byte-parity of `ntsm vcf -p` matrix/center output against the (patched,
see tests/make_fixtures.py) reference ntsmVCF fixture output."""

import pathlib

import pytest

from ntsm_tpu.io.sites import load_site_table
from ntsm_tpu.options import Options
from ntsm_tpu.vcf.convert import VCFConverter, _format_longdouble_g

FIX = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    opts = Options(
        snp=str(FIX / "vcf_sites.fa"), ref=str(FIX / "vcf_genome.fa"), k=19, window=31
    )
    table = load_site_table(opts.snp, opts.k, allow_dupes=False)
    conv = VCFConverter(table, opts)
    conv.count(str(FIX / "multi.vcf"))
    out = tmp_path_factory.mktemp("vcf")
    conv.output_matrix(str(out / "vcfout"))
    return conv, out


def test_matrix_byte_parity(converted):
    _, out = converted
    got = (out / "vcfout_matrix.tsv").read_text()
    expected = (FIX / "vcfout_matrix.tsv").read_text()
    assert got == expected


def test_center_byte_parity(converted):
    _, out = converted
    got = (out / "vcfout_center.txt").read_text()
    expected = (FIX / "vcfout_center.txt").read_text()
    assert got == expected


def test_output_counts_roundtrip(converted, tmp_path):
    """Count files written by --output-counts can be read back by eval and
    reflect genotype-consistent values (multi for het, 2*multi for hom)."""
    conv, _ = converted
    conv.output_counts(str(tmp_path))
    import numpy as np

    from ntsm_tpu.io.countfile import load_count_files

    paths = [str(tmp_path / f"{sid}.counts.txt") for sid in conv.sample_ids]
    locus_ids, distinct, files = load_count_files(paths)
    assert locus_ids == conv.table.site_ids
    mc = np.stack([f.max_counts for f in files])
    assert set(np.unique(mc)) <= {0, 20, 40}


def test_longdouble_format():
    import numpy as np

    assert _format_longdouble_g(np.longdouble(0)) == "0"
    assert (
        _format_longdouble_g(np.longdouble(1) / np.longdouble(6))
        == "0.1666666666666666667"
    )
    assert _format_longdouble_g(np.longdouble("0.5")) == "0.5"


def test_genotype_fast_path_alignment_guard():
    """Mixed-width genotype fields whose total width lands on 4n-1 must NOT
    take the fast path (they'd misalign); reference semantics default them
    to hom-ref unless the exact 3-char strings match."""
    import numpy as np

    from ntsm_tpu.io.sites import SiteTable
    from ntsm_tpu.options import Options
    from ntsm_tpu.vcf.convert import VCFConverter

    conv = VCFConverter.__new__(VCFConverter)  # only _parse_genotypes needed
    gts = conv._parse_genotypes("0|1:7\t1", 2)  # len 7 == 4*2-1
    assert list(gts) == [0, 0]  # both default hom-ref (exact-match rule)
    gts2 = conv._parse_genotypes("0|1\t1|1", 2)
    assert list(gts2) == [1, 2]

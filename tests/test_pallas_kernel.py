"""Pallas hash-stage kernel (interpret mode on CPU): parity with the XLA
window-hash stage and the golden engine through --engine pallas."""

import numpy as np
import pytest

import jax.numpy as jnp

from ntsm_tpu.core.hash import hash64_np, kmer_mask
from ntsm_tpu.count.engine import run_count
from ntsm_tpu.count.golden import count_files
from ntsm_tpu.count.kernel import window_hashes
from ntsm_tpu.count.kernel_v2 import pack_batch, window_hashes_packed
from ntsm_tpu.count.pallas_kernel import (
    pallas_window_hashes,
    pallas_window_hashes_packed,
)
from ntsm_tpu.io.sites import load_site_table
from ntsm_tpu.options import Options
from tests.synth import make_reads_fastq, make_site_fasta


@pytest.mark.parametrize("k", [5, 16, 19, 31, 32])
def test_pallas_window_hashes_match_xla(rng, k):
    B, L = 64, 128
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    codes[rng.random((B, L)) < 0.02] = 4  # Ns
    lengths = rng.integers(k, L + 1, size=B).astype(np.int32)

    h_x, v_x = window_hashes(
        jnp.asarray(codes), jnp.asarray(lengths), k, kmer_mask(k)
    )
    h_p, v_p = pallas_window_hashes(jnp.asarray(codes), jnp.asarray(lengths), k)

    v_x = np.asarray(v_x)
    v_p = np.asarray(v_p)
    np.testing.assert_array_equal(v_p, v_x)
    np.testing.assert_array_equal(np.asarray(h_p)[v_p], np.asarray(h_x)[v_x])


@pytest.mark.parametrize("k", [5, 19, 32])
def test_pallas_packed_hashes_match_xla(rng, k):
    """The packed-input Pallas stage (the one --engine pallas fuses into
    the v3 probe) matches kernel_v2.window_hashes_packed exactly."""
    B, L = 48, 128
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    codes[rng.random((B, L)) < 0.02] = 4  # Ns
    for b in range(B):  # ragged reads: tail positions marked invalid
        codes[b, rng.integers(k, L + 1) :] = 4
    packed, vbits = pack_batch(codes)

    h_x, v_x = window_hashes_packed(
        jnp.asarray(packed), jnp.asarray(vbits), k, L
    )
    h_p, v_p = pallas_window_hashes_packed(
        jnp.asarray(packed), jnp.asarray(vbits), k, L
    )

    v_x = np.asarray(v_x)
    v_p = np.asarray(v_p)
    np.testing.assert_array_equal(v_p, v_x)
    np.testing.assert_array_equal(np.asarray(h_p)[v_p], np.asarray(h_x)[v_x])


def test_pallas_engine_matches_golden(rng, tmp_path):
    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=12, path=sites_path)
    fq = str(tmp_path / "reads.fq")
    make_reads_fastq(rng, sites, coverage=5, genotype="het", path=fq)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    golden = count_files(table, [fq])
    res = run_count(table, [fq], Options(), use_pallas=True)
    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers
    assert res.total_hits == golden.total_hits

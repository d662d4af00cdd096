"""Encoder/hash golden tests against hand-derived reference semantics
(vendor/KseqHashIterator.hpp)."""

import numpy as np
import pytest

from ntsm_tpu.core.encode import NT4_TABLE, encode_str
from ntsm_tpu.core.hash import hash64_np, kmer_mask
from ntsm_tpu.core.kmers import canonical_hashes


def ref_hash64(key: int, mask: int) -> int:
    """Literal transcription of hash64 (KseqHashIterator.hpp:129-139)."""
    M = (1 << 64) - 1
    key = (~key + (key << 21)) & M & mask
    key = key ^ (key >> 24)
    key = ((key + (key << 3)) + (key << 8)) & M & mask
    key = key ^ (key >> 14)
    key = ((key + (key << 2)) + (key << 4)) & M & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & M & mask
    return key


def ref_iterator(seq: str, k: int):
    """Literal transcription of the rolling iterator (:95-112)."""
    nt4 = {c: v for c, v in zip("ACGT", range(4))}
    nt4.update({c: v for c, v in zip("acgt", range(4))})
    nt4["U"] = nt4["u"] = 3
    mask = (1 << (2 * k)) - 1
    shift = (k - 1) * 2
    fw = rv = sublen = 0
    out = []
    for ch in seq:
        c = nt4.get(ch, 4)
        if c < 4:
            fw = ((fw << 2) | c) & mask
            rv = (rv >> 2) | ((3 - c) << shift)
            sublen += 1
            if sublen >= k:
                out.append(ref_hash64(min(fw, rv), mask))
        else:
            fw = rv = sublen = 0
    return out


def test_nt4_table():
    for c, v in zip("ACGTacgt", [0, 1, 2, 3, 0, 1, 2, 3]):
        assert NT4_TABLE[ord(c)] == v
    assert NT4_TABLE[ord("U")] == 3 and NT4_TABLE[ord("u")] == 3
    for c in "NnXY@ \n0-":
        assert NT4_TABLE[ord(c)] == 4


def test_hash64_matches_reference_scalar():
    mask = int(kmer_mask(19))
    keys = [0, 1, 12345678901, mask, mask // 3]
    got = hash64_np(np.array(keys, dtype=np.uint64), kmer_mask(19))
    want = [ref_hash64(x, mask) for x in keys]
    assert [int(g) for g in got] == want


@pytest.mark.parametrize("k", [5, 19, 31])
def test_canonical_hashes_match_rolling_iterator(rng, k):
    from tests.synth import random_genome

    for trial in range(5):
        seq = bytearray(random_genome(rng, 300))
        # sprinkle Ns and lowercase
        for p in rng.integers(0, len(seq), size=6):
            seq[p] = ord("N")
        for p in rng.integers(0, len(seq), size=20):
            seq[p] = ord(chr(seq[p]).lower())
        s = seq.decode()
        got = [int(h) for h in canonical_hashes(s, k)]
        want = ref_iterator(s, k)
        assert got == want


def test_canonical_hash_revcomp_invariance(rng):
    from tests.synth import random_genome, revcomp

    seq = random_genome(rng, 200)
    fwd = sorted(int(h) for h in canonical_hashes(seq, 19))
    rev = sorted(int(h) for h in canonical_hashes(revcomp(seq), 19))
    assert fwd == rev


def test_short_and_empty_sequences():
    assert canonical_hashes("", 19).shape[0] == 0
    assert canonical_hashes("ACGT", 19).shape[0] == 0
    assert canonical_hashes("A" * 19, 19).shape[0] == 1


def test_positions_match_reference_getpos():
    seq = "ACGTACGTACGTACGTACGTACGT"  # len 24, k=19 -> 6 windows
    hashes, pos = canonical_hashes(seq, 19, with_pos=True)
    assert list(pos) == [19, 20, 21, 22, 23, 24]

"""flat_window_hashes: native C++ roller vs the numpy parity oracle."""

import numpy as np
import pytest

from ntsm_tpu import native
from ntsm_tpu.core.hash import hash64_np, kmer_mask
from ntsm_tpu.core.kmers import flat_window_hashes, window_encodings


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("k", [3, 16, 19, 31, 32])
def test_native_matches_numpy(rng, k):
    codes = rng.integers(0, 4, size=100_000, dtype=np.uint8)
    codes[rng.random(codes.shape[0]) < 0.01] = 4  # Ns
    codes[:5] = 4  # leading invalids
    codes[-3:] = 4
    h_nat, v_nat = flat_window_hashes(codes, k)
    fw, rv, v_np = window_encodings(codes, k)
    h_np = hash64_np(np.minimum(fw, rv), kmer_mask(k))
    np.testing.assert_array_equal(v_nat, v_np)
    np.testing.assert_array_equal(h_nat[v_nat], h_np[v_np])


def test_short_streams(rng):
    for n in (0, 5, 18, 19, 20):
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        h, v = flat_window_hashes(codes, 19)
        assert h.shape[0] == max(0, n - 18)
        assert v.shape == h.shape

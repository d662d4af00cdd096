"""Native counts.txt parser edge cases (ntsm_parse_counts / _counts2).

ntsm_parse_counts2's fast row loop parses '\n'-terminated rows without
per-char bounds checks; these pin the boundary paths: unterminated tail
row, CRLF, blank lines, header placement, and the malformed-input -1
contract (which the Python loaders turn into the exact slow-path parse or
a clean error).  Both native entry points (the int64 v1 used for file 0
and the int32 plane-writing v2 used for files 1..N-1) run the same cases.
Reference grammar being replicated: CompareCounts.hpp:30-114.
"""

import ctypes

import numpy as np
import pytest

from ntsm_tpu import native
from ntsm_tpu.io import countfile


@pytest.fixture(autouse=True)
def _need_native():
    if native.load() is None:
        pytest.skip("native library unavailable")


def _parse_v1(tmp_path, text: str):
    p = tmp_path / "c1.txt"
    p.write_bytes(text.encode())
    got = countfile._parse_native(str(p))
    if got is None:
        return None
    tk, ks, blob, ints = got
    return tk, ks, blob, np.asarray(ints)[:, :6]


def _parse_v2(text: str):
    lib = native.load()
    buf = text.encode()
    cap = buf.count(b"\n") + 2
    mc = np.zeros((cap, 2), np.int32)
    sc = np.zeros((cap, 2), np.int32)
    dist = np.zeros((cap, 2), np.int64)
    ids = np.zeros(len(buf) + cap + 16, np.uint8)
    ids_len = ctypes.c_long(0)
    tk = ctypes.c_long(0)
    ks = ctypes.c_long(0)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
    r = lib.ntsm_parse_counts2(
        buf, ctypes.c_long(len(buf)), vp(mc), vp(sc), vp(dist),
        ctypes.c_long(cap), vp(ids), ctypes.c_long(ids.shape[0]),
        ctypes.byref(ids_len), ctypes.byref(tk), ctypes.byref(ks),
    )
    if r < 0:
        return None
    blob = ids[: ids_len.value].tobytes()
    ints = np.concatenate([mc[:r], sc[:r], dist[:r]], axis=1).astype(np.int64)
    # column order of v1: countAT countCG sumAT sumCG distinctAT distinctCG
    return tk.value, ks.value, blob, ints


def both(tmp_path, text):
    return _parse_v1(tmp_path, text), _parse_v2(text)


ROWS = "rs1\t1\t2\t3\t4\t5\t6\nrs2\t10\t20\t30\t40\t50\t60\n"
HDR = "#@TK\t1234\n#@KS\t19\n#locusID\tx\n"


def _check_two_rows(got):
    tk, ks, blob, ints = got
    assert blob == b"rs1\nrs2\n"
    assert ints[0].tolist() == [1, 2, 3, 4, 5, 6]
    assert ints[1].tolist() == [10, 20, 30, 40, 50, 60]


def test_basic_with_header(tmp_path):
    for got in both(tmp_path, HDR + ROWS):
        assert got is not None
        assert (got[0], got[1]) == (1234, 19)
        _check_two_rows(got)


def test_no_trailing_newline(tmp_path):
    for got in both(tmp_path, HDR + ROWS.rstrip("\n")):
        assert got is not None
        _check_two_rows(got)


def test_crlf_and_blank_lines(tmp_path):
    text = HDR.replace("\n", "\r\n") + "\r\n\n" + ROWS.replace("\n", "\r\n")
    for got in both(tmp_path, text):
        assert got is not None
        assert (got[0], got[1]) == (1234, 19)
        _check_two_rows(got)


def test_header_as_unterminated_tail(tmp_path):
    for got in both(tmp_path, ROWS + "#@TK\t77"):
        assert got is not None
        assert got[0] == 77
        assert got[3].shape[0] == 2


def test_malformed_rows_rejected(tmp_path):
    for bad in (
        "rs1\t1\t2\t3\t4\t5\n",  # 5 numeric cols
        "rs1\t1\t2\t3\t4\t5\t6\t7\n",  # 7 numeric cols
        "rs1 1 2 3 4 5 6\n",  # no tabs
        "rs1\t1\t2\tx\t4\t5\t6\n",  # non-numeric
        "rs1\t1\t2\t3\t4\t5\t6 \n",  # trailing junk
        "noTabLine\nrs2\t1\t2\t3\t4\t5\t6\n",  # id line without any tab
        "rs1\t\t2\t3\t4\t5\t6\n",  # empty column
        "rs1\t-\t2\t3\t4\t5\t6\n",  # bare minus
        "rs1\t1\t2\t3\t4\t5\t",  # unterminated, truncated after tab
    ):
        v1, v2 = both(tmp_path, bad)
        assert v1 is None, ("v1", bad)
        assert v2 is None, ("v2", bad)


def test_negative_values(tmp_path):
    for got in both(tmp_path, "rs1\t-1\t2\t3\t4\t-5\t6\n"):
        assert got is not None
        assert got[3][0].tolist() == [-1, 2, 3, 4, -5, 6]


def test_i32_overflow_rejected_by_v2_only(tmp_path):
    big = f"rs1\t{2**31}\t2\t3\t4\t5\t6\n"
    v1, v2 = both(tmp_path, big)
    assert v1 is not None  # int64 path holds it
    assert v1[3][0, 0] == 2**31
    assert v2 is None  # bulk i32 loader must fall back


def test_bulk_loader_roundtrip(tmp_path):
    paths = []
    rng = np.random.default_rng(3)
    ids = [f"rs{i}" for i in range(37)]
    want = []
    for s in range(3):
        mx = rng.integers(0, 300, size=(37, 2))
        sm = mx * 13
        text = countfile.format_counts(
            ids, mx, sm, np.full((37, 2), 9), 1000 + s, 19
        )
        p = tmp_path / f"s{s}.txt"
        p.write_text(text)
        paths.append(str(p))
        want.append(mx)
    locus_ids, distinct, mc, sc, tks, kss = countfile.load_count_arrays(paths)
    assert locus_ids == ids
    for s in range(3):
        np.testing.assert_array_equal(mc[s], want[s])
        np.testing.assert_array_equal(sc[s], want[s] * 13)
    assert tks.tolist() == [1000, 1001, 1002]


def _wire_cohort(tmp_path, rows_per_sample):
    """Write count files from explicit [L, 2] max-count arrays."""
    ids = [f"rs{i}" for i in range(len(rows_per_sample[0]))]
    paths = []
    for s, mx in enumerate(rows_per_sample):
        mx = np.asarray(mx)
        text = countfile.format_counts(
            ids, mx, mx * 3, np.full((mx.shape[0], 2), 9), 500 + s, 19
        )
        p = tmp_path / f"w{s}.txt"
        p.write_text(text)
        paths.append(str(p))
    return ids, paths


def test_wire_loader_u8_tier(tmp_path):
    """All counts < 256 -> the wire planes ride the u8 tier."""
    rng = np.random.default_rng(5)
    rows = [rng.integers(0, 200, size=(9, 2)) for _ in range(3)]
    ids, paths = _wire_cohort(tmp_path, rows)
    wires = countfile.load_count_wires(paths)
    if wires is None:
        pytest.skip("native wire loader unavailable")
    locus_ids, _, wa, wb, *_ = wires
    assert locus_ids == ids
    assert wa.dtype == np.uint8 and wb.dtype == np.uint8
    for s, mx in enumerate(rows):
        np.testing.assert_array_equal(wa[s, :9], mx[:, 0])
        np.testing.assert_array_equal(wb[s, :9], mx[:, 1])


def test_wire_loader_u16_escalation_mid_parse(tmp_path):
    """A count >= 256 in a LATER file escalates the whole plane to u16
    with earlier rows preserved exactly (the loader parses into u8 and
    widens on first overflow — load_count_wires._store)."""
    rng = np.random.default_rng(6)
    rows = [rng.integers(0, 200, size=(9, 2)) for _ in range(3)]
    rows[2] = rows[2].copy()
    rows[2][4, 1] = 41_000  # second allele plane, third file
    ids, paths = _wire_cohort(tmp_path, rows)
    wires = countfile.load_count_wires(paths)
    if wires is None:
        pytest.skip("native wire loader unavailable")
    _, _, wa, wb, *_ = wires
    assert wa.dtype == np.uint16 and wb.dtype == np.uint16
    for s, mx in enumerate(rows):
        np.testing.assert_array_equal(wa[s, :9], mx[:, 0])
        np.testing.assert_array_equal(wb[s, :9], mx[:, 1])
    assert int(wb[2, 4]) == 41_000


def test_overflowing_count_column_falls_back(tmp_path):
    """A >=20-digit count column must route to the checked fallback (the
    native digit loops return -1 at the int64 cap) instead of wrapping
    silently into a small valid-looking value."""
    from ntsm_tpu.io.countfile import _parse_native

    p = tmp_path / "c.txt"
    p.write_text(
        "#@TK\t100\n#@KS\t19\n"
        "locusID\tcountAT\tcountCG\tsumAT\tsumCG\tdistinctAT\tdistinctCG\n"
        "rs1\t18446744073709551617\t3\t4\t5\t6\t7\n"
    )
    assert _parse_native(str(p)) is None

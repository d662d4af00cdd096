"""Native C++ chunker: batch-exact parity with the Python reader across
formats (FASTQ, multi-line FASTA, gzip, multi-member gzip), long-read
segmentation, batch-boundary carries, and the 2-bit pack."""

import gzip

import numpy as np
import pytest

from ntsm_tpu import native
from ntsm_tpu.count.kernel_v2 import pack_batch
from ntsm_tpu.io.fastx import NativeBatchReader, PrefetchReader, PyBatchReader

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native reader not built"
)


def _batches(reader):
    return [(b.codes, b.lengths, b.n_reads, b.n_bases) for b in reader]


def _assert_same(paths, k=19, seglen=128, batch=16):
    py = _batches(PyBatchReader(paths, k=k, seglen=seglen, batch=batch))
    nt = _batches(NativeBatchReader(paths, k=k, seglen=seglen, batch=batch))
    assert len(py) == len(nt)
    for (pc, pl, pr, pb), (nc, nl, nr, nb) in zip(py, nt):
        np.testing.assert_array_equal(nc, pc)
        np.testing.assert_array_equal(nl, pl)
        assert nr == pr
        assert nb == pb


def _write_fastq(path, seqs, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@r{i} extra stuff\n{s}\n+\n{'I' * len(s)}\n")


def _rand_seq(rng, n, n_frac=0.0):
    bases = np.array(list("ACGTacgtN"), dtype="U1")
    p = np.array([0.12] * 8 + [0.04])
    p[-1] = n_frac if n_frac else p[-1]
    p = p / p.sum()
    return "".join(rng.choice(bases, size=n, p=p))


def test_fastq_parity(rng, tmp_path):
    fq = str(tmp_path / "a.fq")
    _write_fastq(fq, [_rand_seq(rng, int(n)) for n in rng.integers(30, 400, 60)])
    _assert_same([fq])


def test_fastq_gzip_parity(rng, tmp_path):
    fq = str(tmp_path / "a.fq.gz")
    _write_fastq(fq, [_rand_seq(rng, int(n)) for n in rng.integers(30, 400, 60)], gz=True)
    _assert_same([fq])


def test_multimember_gzip(rng, tmp_path):
    p1 = tmp_path / "p1.gz"
    p2 = tmp_path / "p2.gz"
    _write_fastq(str(p1), [_rand_seq(rng, 100) for _ in range(5)], gz=True)
    _write_fastq(str(p2), [_rand_seq(rng, 100) for _ in range(5)], gz=True)
    cat = tmp_path / "cat.fq.gz"
    cat.write_bytes(p1.read_bytes() + p2.read_bytes())  # bgzf-style concat
    _assert_same([str(cat)])


def test_multiline_fasta_parity(rng, tmp_path):
    fa = str(tmp_path / "a.fa")
    with open(fa, "w") as fh:
        for i in range(20):
            s = _rand_seq(rng, int(rng.integers(50, 700)))
            fh.write(f">ctg{i} desc\n")
            for j in range(0, len(s), 60):
                fh.write(s[j : j + 60] + "\n")
    _assert_same([fa])


def test_long_reads_and_carry(rng, tmp_path):
    """Reads much longer than seglen with a tiny batch size force carries
    across batch boundaries."""
    fq = str(tmp_path / "long.fq")
    _write_fastq(fq, [_rand_seq(rng, 3000, n_frac=0.02) for _ in range(7)])
    _assert_same([fq], seglen=96, batch=3)


def test_multi_file_mixed(rng, tmp_path):
    fq = str(tmp_path / "a.fq")
    fa = str(tmp_path / "b.fa")
    gz = str(tmp_path / "c.fq.gz")
    _write_fastq(fq, [_rand_seq(rng, 150) for _ in range(10)])
    with open(fa, "w") as fh:
        for i in range(4):
            fh.write(f">c{i}\n{_rand_seq(rng, 333)}\n")
    _write_fastq(gz, [_rand_seq(rng, 80) for _ in range(10)], gz=True)
    _assert_same([fq, fa, gz])


def test_crlf_lines(rng, tmp_path):
    fq = str(tmp_path / "crlf.fq")
    with open(fq, "wb") as fh:
        for i in range(6):
            s = _rand_seq(rng, 120)
            fh.write(f"@r{i}\r\n{s}\r\n+\r\n{'I'*len(s)}\r\n".encode())
    _assert_same([fq])


def _write_wrapped_fastq(path, seqs, width=40):
    """Line-wrapped FASTQ (legal per kseq, vendor/kseq.h:178-219):
    sequence and quality split over multiple lines; quality lines may
    start with '@' (it's a valid phred char)."""
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            q = "@" + "I" * (len(s) - 1) if len(s) > 1 else "I"
            fh.write(f"@w{i} wrapped\n")
            for j in range(0, len(s), width):
                fh.write(s[j : j + width] + "\n")
            fh.write("+w{} same name allowed\n".format(i))
            for j in range(0, len(q), width):
                fh.write(q[j : j + width] + "\n")


def test_wrapped_fastq_native_python_parity(rng, tmp_path):
    fq = str(tmp_path / "wrapped.fq")
    _write_wrapped_fastq(
        fq, [_rand_seq(rng, int(n)) for n in rng.integers(30, 400, 40)]
    )
    _assert_same([fq])
    _assert_same_dense([fq])


def test_wrapped_fastq_equals_flat(rng, tmp_path):
    """A wrapped FASTQ must produce the same batches as the identical
    reads written 4-line flat — the kseq behavior the reference gets."""
    seqs = [_rand_seq(rng, int(n), n_frac=0.02) for n in rng.integers(30, 500, 30)]
    flat = str(tmp_path / "flat.fq")
    wrap = str(tmp_path / "wrap.fq")
    _write_fastq(flat, seqs)
    _write_wrapped_fastq(wrap, seqs, width=37)
    for cls in (PyBatchReader, NativeBatchReader):
        a = _batches(cls([flat], k=19, seglen=128, batch=8))
        b = _batches(cls([wrap], k=19, seglen=128, batch=8))
        assert len(a) == len(b)
        for (ac, al, ar, ab), (bc, bl, br, bb) in zip(a, b):
            np.testing.assert_array_equal(ac, bc)
            np.testing.assert_array_equal(al, bl)
            assert (ar, ab) == (br, bb)


def test_mixed_fasta_fastq_single_file(rng, tmp_path):
    """kseq accepts FASTA and FASTQ records interleaved in one stream."""
    mixed = str(tmp_path / "mixed.fq")
    s1, s2, s3 = (_rand_seq(rng, n) for n in (120, 90, 200))
    with open(mixed, "w") as fh:
        fh.write(f"@r0\n{s1}\n+\n{'I' * len(s1)}\n")
        fh.write(f">c0 fasta in the middle\n{s2[:45]}\n{s2[45:]}\n")
        fh.write(f"@r1\n{s3}\n+\n{'I' * len(s3)}\n")
    _assert_same([mixed])
    from ntsm_tpu.io.fastx import read_fastx

    recs = list(read_fastx(mixed))
    assert [r.name for r in recs] == ["r0", "c0", "r1"]
    assert recs[1].seq.decode() == s2
    assert recs[1].qual is None


def test_native_pack_matches_numpy(rng):
    import ctypes

    lib = native.load()
    B, L = 64, 256
    codes = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
    exp_p, exp_v = pack_batch(codes)
    got_p = np.empty((B, L // 4), dtype=np.uint8)
    got_v = np.empty((B, L // 8), dtype=np.uint8)
    lib.ntsm_pack_batch(
        codes.ctypes.data_as(ctypes.c_void_p),
        B,
        L,
        got_p.ctypes.data_as(ctypes.c_void_p),
        got_v.ctypes.data_as(ctypes.c_void_p),
    )
    np.testing.assert_array_equal(got_p, exp_p)
    np.testing.assert_array_equal(got_v, exp_v)


def test_prefetch_wrapper(rng, tmp_path):
    fq = str(tmp_path / "a.fq")
    _write_fastq(fq, [_rand_seq(rng, 200) for _ in range(40)])
    base = _batches(PyBatchReader([fq], k=19, seglen=128, batch=8))
    pre = _batches(PrefetchReader(PyBatchReader([fq], k=19, seglen=128, batch=8)))
    assert len(base) == len(pre)
    for (a, al, *_), (b, bl, *_) in zip(base, pre):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(al, bl)


def test_parallel_file_reader_same_multiset(rng, tmp_path):
    """Batch order varies across file groups, but the multiset of segments
    (and read/base totals) matches the sequential reader."""
    from ntsm_tpu.io.fastx import ParallelFileReader

    paths = []
    for i in range(5):
        p = str(tmp_path / f"f{i}.fq")
        _write_fastq(p, [_rand_seq(rng, int(n)) for n in rng.integers(30, 300, 20)])
        paths.append(p)

    def rows(reader):
        out = []
        nr = nb = 0
        for b in reader:
            nr += b.n_reads
            nb += b.n_bases
            for r in range(b.codes.shape[0]):
                if b.lengths[r] > 0:
                    out.append(bytes(b.codes[r, : b.lengths[r]]))
        return sorted(out), nr, nb

    seq_rows, nr1, nb1 = rows(PyBatchReader(paths, k=19, seglen=128, batch=8))
    par_rows, nr2, nb2 = rows(
        ParallelFileReader(paths, k=19, seglen=128, batch=8, threads=3)
    )
    assert seq_rows == par_rows
    assert (nr1, nb1) == (nr2, nb2)


def test_count_with_threads_matches_golden(rng, tmp_path):
    from ntsm_tpu.count.engine import EngineConfig, run_count_v3
    from ntsm_tpu.count.golden import count_files
    from ntsm_tpu.io.sites import load_site_table
    from ntsm_tpu.options import Options
    from tests.synth import make_reads_fastq, make_site_fasta

    sites_path = str(tmp_path / "sites.fa")
    _, sites = make_site_fasta(rng, n_sites=12, path=sites_path)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"r{i}.fq.gz")
        make_reads_fastq(rng, sites[i::4] if i < 4 else sites, coverage=4, path=p, gz=True)
        paths.append(p)
    table = load_site_table(sites_path, k=19, allow_dupes=False)
    golden = count_files(table, paths)
    res = run_count_v3(
        table, paths, Options(threads=3), EngineConfig(batch_reads=32, segment_len=96)
    )
    import numpy as np

    np.testing.assert_array_equal(res.counts, golden.counts)
    assert res.total_kmers == golden.total_kmers
    assert res.total_reads == golden.total_reads


def _assert_same_dense(paths, k=19, seglen=128, batch=16):
    py = _batches(PyBatchReader(paths, k=k, seglen=seglen, batch=batch, dense=True))
    nt = _batches(
        NativeBatchReader(paths, k=k, seglen=seglen, batch=batch, dense=True)
    )
    assert len(py) == len(nt)
    for (pc, pl, pr, pb), (nc, nl, nr, nb) in zip(py, nt):
        np.testing.assert_array_equal(nc, pc)
        np.testing.assert_array_equal(nl, pl)
        assert nr == pr
        assert nb == pb


def test_dense_parity_fastq(rng, tmp_path):
    fq = str(tmp_path / "a.fq")
    _write_fastq(fq, [_rand_seq(rng, int(n)) for n in rng.integers(10, 400, 80)])
    _assert_same_dense([fq])


def test_dense_parity_long_reads_tiny_batch(rng, tmp_path):
    fq = str(tmp_path / "long.fq")
    _write_fastq(fq, [_rand_seq(rng, 2000, n_frac=0.02) for _ in range(6)])
    _assert_same_dense([fq], seglen=96, batch=2)


def test_dense_parity_mixed_files(rng, tmp_path):
    fq = str(tmp_path / "a.fq")
    gz = str(tmp_path / "b.fq.gz")
    _write_fastq(fq, [_rand_seq(rng, int(n)) for n in rng.integers(25, 220, 30)])
    _write_fastq(gz, [_rand_seq(rng, 80) for _ in range(10)], gz=True)
    _assert_same_dense([fq, gz], seglen=160, batch=4)


def test_dense_kmers_multiset_exact(rng, tmp_path):
    """Dense packing must preserve the exact multiset of canonical k-mers
    (separator + halo invariants)."""
    from ntsm_tpu.core.kmers import canonical_hashes
    from ntsm_tpu.io.fastx import read_fastx

    fq = str(tmp_path / "a.fq")
    _write_fastq(fq, [_rand_seq(rng, int(n), n_frac=0.03) for n in rng.integers(10, 500, 50)])
    k = 19
    expect = []
    for rec in read_fastx(fq):
        expect.extend(canonical_hashes(rec.seq, k).tolist())
    got = []
    for b in NativeBatchReader([fq], k=k, seglen=128, batch=8, dense=True):
        for r in range(b.codes.shape[0]):
            row = b.codes[r]
            # decode row back to an ASCII-ish sequence for canonical_hashes
            s = bytes(bytearray(b"ACGTN"[c] for c in row))
            got.extend(canonical_hashes(s, k).tolist())
    assert sorted(got) == sorted(expect)


def test_leading_junk_header_hunt(rng, tmp_path):
    """kseq's header hunt (vendor/kseq.h:182-186): bytes before the first
    '>'/'@' are skipped — including a header char mid-line — instead of
    erroring; both readers must agree."""
    fq = tmp_path / "junk.fq"
    fq.write_text(
        "; random comment line\n"
        "more garbage\n"
        "@r0\nACGTACGTAC\n+\nIIIIIIIIII\n"
        "@r1\nTTTTGGGGCC\n+\nIIIIIIIIII\n"
    )
    _assert_same([str(fq)], seglen=32)

    fa = tmp_path / "midline.fa"
    fa.write_text("junk bytes >ctg0 desc\nACGTACGTACGTACGTACGT\n")
    _assert_same([str(fa)], seglen=32)

    from ntsm_tpu.io.fastx import read_fastx

    recs = list(read_fastx(str(fa)))
    assert [r.name for r in recs] == ["ctg0"]
    assert recs[0].seq == b"ACGTACGTACGTACGTACGT"


def test_junk_between_fastq_records(rng, tmp_path):
    """After a FASTQ record kseq resets last_char (kseq.h:216) and hunts
    again, so inter-record garbage is skipped silently."""
    fq = tmp_path / "between.fq"
    fq.write_text(
        "@r0\nACGTACGTAC\n+\nIIIIIIIIII\n"
        "-- divider junk --\n"
        "@r1\nTTTTGGGGCC\n+\nIIIIIIIIII\n"
    )
    _assert_same([str(fq)], seglen=32)
    from ntsm_tpu.io.fastx import read_fastx

    recs = list(read_fastx(str(fq)))
    assert [r.name for r in recs] == ["r0", "r1"]


def test_pure_junk_file_yields_nothing(rng, tmp_path):
    """A file with no header char anywhere parses as zero records (kseq
    returns EOF from the hunt), not an error."""
    p = tmp_path / "junk.txt"
    p.write_text("no headers here\njust text\n")
    from ntsm_tpu.io.fastx import read_fastx

    assert list(read_fastx(str(p))) == []
    _assert_same([str(p)], seglen=32)


def test_bad_quality_aborts_file(rng, tmp_path):
    """kseq_read returns -2 on a quality/sequence length mismatch and the
    reference's per-file loop stops; both readers must drop the bad
    record AND everything after it in that file, while later files still
    parse."""
    good = "@r0\nACGTACGTAC\n+\nIIIIIIIIII\n"
    bad = tmp_path / "bad.fq"
    bad.write_text(good + "@bad\nACGT\n+\nIIIIIIIIII\n" + good)
    ok = tmp_path / "ok.fq"
    ok.write_text("@r1\nTTTTGGGGCC\n+\nIIIIIIIIII\n")
    _assert_same([str(bad), str(ok)], seglen=32)
    from ntsm_tpu.io.fastx import read_fastx

    assert [r.name for r in read_fastx(str(bad))] == ["r0"]
    nb = _batches(NativeBatchReader([str(bad), str(ok)], k=5, seglen=32, batch=8))
    assert sum(b[2] for b in nb) == 2  # r0 + r1, bad tail dropped


def test_truncated_gzip_counts_partial(rng, tmp_path):
    """gzread semantics: a truncated .gz yields every byte zlib could
    inflate, then EOF — no error.  Native and Python readers must agree
    on the partial record stream at several cut points."""
    import io as _io

    blob_io = _io.BytesIO()
    with gzip.GzipFile(fileobj=blob_io, mode="wb") as zf:
        for i in range(40):
            s = _rand_seq(rng, 80)
            zf.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n".encode())
    blob = blob_io.getvalue()
    for frac in (0.2, 0.5, 0.9):
        p = tmp_path / f"t{int(frac * 100)}.fq.gz"
        p.write_bytes(blob[: int(len(blob) * frac)])
        _assert_same([str(p)], seglen=48)


def test_corrupt_gzip_window_voiding_parity(rng, tmp_path):
    """gzread's measured damage semantics (A/B'd vs the reference
    binary): a zlib data error voids the erroring 16384-byte call window
    entirely; prior windows stand.  Both readers stage gz output through
    aligned 16384-byte windows — flip bytes at several depths and they
    must agree batch-for-batch."""
    import io as _io

    blob_io = _io.BytesIO()
    with gzip.GzipFile(fileobj=blob_io, mode="wb") as zf:
        for i in range(400):
            s = _rand_seq(rng, 120)
            zf.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n".encode())
    blob = bytearray(blob_io.getvalue())
    for name, pos in (
        ("crc", len(blob) - 6),
        ("isize", len(blob) - 2),
        ("mid", len(blob) // 2),
        ("q3", 3 * len(blob) // 4),
        ("early", 30),
    ):
        b2 = bytearray(blob)
        b2[pos] ^= 0x01
        p = tmp_path / f"{name}.fq.gz"
        p.write_bytes(bytes(b2))
        _assert_same([str(p)], seglen=64)


def test_zlib_fallback_stream(rng, tmp_path, monkeypatch):
    """The decompressobj fallback (_ZlibRaw, used when libz can't be
    dlopen'd) still parses clean and truncated gz; corrupt-member
    exactness is only guaranteed on the _InflateRaw path."""
    import ntsm_tpu.io.fastx as FX

    monkeypatch.setattr(FX, "_libz", lambda: None)
    import io as _io

    blob_io = _io.BytesIO()
    with gzip.GzipFile(fileobj=blob_io, mode="wb") as zf:
        for i in range(50):
            s = _rand_seq(rng, 90)
            zf.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n".encode())
    blob = blob_io.getvalue()
    clean = tmp_path / "c.fq.gz"
    clean.write_bytes(blob)
    assert len(list(FX.read_fastx(str(clean)))) == 50
    trunc = tmp_path / "t.fq.gz"
    trunc.write_bytes(blob[: len(blob) // 2])
    recs = list(FX.read_fastx(str(trunc)))
    assert 0 < len(recs) < 50


def test_trailing_garbage_gzip_keeps_all_records(rng, tmp_path):
    """gz_look semantics (zlib gzread.c): non-magic bytes after the
    final member are trailing garbage — ignored with a clean finish and
    EVERY inflated byte delivered.  Both readers previously voided the
    final 16 KB window by inflating the garbage as a new member."""
    import io as _io

    blob_io = _io.BytesIO()
    n = 200
    with gzip.GzipFile(fileobj=blob_io, mode="wb") as zf:
        for i in range(n):
            s = _rand_seq(rng, 90)
            zf.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n".encode())
    for junk in (b"junk" * 64, b"\x00" * 7, b"\x1f"):  # incl. a lone 0x1f
        p = tmp_path / f"g{len(junk)}.fq.gz"
        p.write_bytes(blob_io.getvalue() + junk)
        # every record must survive in BOTH readers
        from ntsm_tpu.io.fastx import read_fastx

        assert sum(1 for _ in read_fastx(str(p))) == n
        _assert_same([str(p)], seglen=48)


def test_trailing_garbage_then_magic_is_data_error(rng, tmp_path):
    """Garbage that DOES start with the gzip magic is treated as a new
    member; its inflate failure voids that call's window (the measured
    in-member damage semantics), and both readers agree."""
    import io as _io

    blob_io = _io.BytesIO()
    with gzip.GzipFile(fileobj=blob_io, mode="wb") as zf:
        for i in range(200):
            s = _rand_seq(rng, 90)
            zf.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n".encode())
    p = tmp_path / "m.fq.gz"
    p.write_bytes(blob_io.getvalue() + b"\x1f\x8b" + b"\x00" * 32)
    _assert_same([str(p)], seglen=48)


def test_non_ascii_header_parses(tmp_path):
    """kseq keeps names as raw bytes; a 0x80+ header byte must parse,
    not crash (latin-1 maps bytes 1:1)."""
    from ntsm_tpu.io.fastx import read_fastx

    p = tmp_path / "n.fa"
    p.write_bytes(b">r\xe9name desc\nACGTACGT\n")
    recs = list(read_fastx(str(p)))
    assert len(recs) == 1
    assert recs[0].name == "r\xe9name"

"""TPU all-vs-all scoring engine.

The reference's O(N² · sites) OpenMP pair loop (computeScore,
src/CompareCounts.hpp:591-624) becomes dense device linear algebra:

* All relatedness / IBS / validity tallies are inner products of genotype
  one-hot indicator planes — a handful of [N, L] @ [L, N] matmuls on the
  MXU.  One side of every matmul is 0/1 so products are exact in f32 and
  the integer results are exact while counts stay below 2^24.

* The log-likelihood is decomposed per site into an integer part and a
  small fractional part using  x²/t = x − x·y/t :

      sumLogPSingle site term  = [a>mc]·a + [b>mc]·b − ([a>mc]+[b>mc])·ab/t
      sumLogPJoint  site term  =  same with a = a_i+a_j, b = b_i+b_j

  (reference formulas: CompareCounts.hpp:968-991, 1013-1033).  The single
  terms only depend on one sample, so their pair sums are matmuls against
  the pair-validity plane; only the joint fractional term needs a blocked
  [tile, N, chunk] pairwise pass on the VPU.

* Precision: per-chunk sums are f32, cross-chunk accumulation is f64
  (emulated on TPU, cheap at [tile, N] granularity).  Empirical score
  agreement with the exact f64 engine is ~1e-9 relative; classification
  (same/differ at the 0.5 threshold) is identical.  Use --engine exact for
  bit-level output parity with the C++ reference.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ntsm_tpu.eval.exact import (
    DBL_MAX,
    HEADER,
    PairResult,
    Relate,
    results_row,
)
from ntsm_tpu.eval.model import HET, HOM_AT, HOM_CG, UNKNOWN, CountData
from ntsm_tpu.options import Options
from ntsm_tpu.utils.formats import cpp_div

CHUNK = 256  # sites per f32 partial sum (1024 was 15% faster at N=768
# but 7% slower at N=3202; 256 is the stable choice)
ROW_TILE = 64  # pair-block rows per joint-pass invocation


def _pad_sites(x: np.ndarray, c: int, value=0):
    L = x.shape[-1]
    pad = (-L) % c
    if pad:
        width = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        x = np.pad(x, width, constant_values=value)
    return x


def _wire(x_np: np.ndarray) -> np.ndarray:
    """Count-plane wire format for the host->device upload.

    Counts are small integers (site max counts; ~2x coverage at the top),
    so a u8/u16 wire quarters/halves the transfer against f32 — the
    upload dominates eval wall time on slow links (N=3202 planes are
    ~2.5 GB as f32).  The device side widens back to f32 on entry (every
    consumer starts with .astype(float32), a no-op for an f32 input).
    Values that don't fit u16 fall back to f32 wire; f32 is exact for
    integers up to 2^24, so a count plane beyond that (unreachable for
    real coverage depths — 2^24 site hits of one allele in one sample)
    raises rather than silently rounding before the exact-integer-tally
    claims."""
    if x_np.size and x_np.min() >= 0.0:
        hi = x_np.max()
        if hi < 256.0:
            return x_np.astype(np.uint8)
        if hi < 65536.0:
            return x_np.astype(np.uint16)
    if x_np.size and x_np.max() > 2.0**24:
        raise ValueError(
            "count plane exceeds 2^24; the f32 wire fallback would round "
            f"integer counts (max={x_np.max():.0f})"
        )
    return x_np


def _wire_plane(counts: np.ndarray, allele: int, c: int) -> np.ndarray:
    """One allele's padded wire plane straight from the integer
    [N, L, 2] counts — u16 without an f32 intermediate.

    The f32 round-trip (strided astype + pad + u16 cast) was ~22 s of pure
    host time for an N=3202 cohort; this is two passes (int max + one
    strided int->u16 copy into the padded buffer).  Semantics identical to
    _wire(_pad_sites(x.astype(f32), c)): u16 when everything fits, else
    f32 with the 2^24 exactness guard.

    Tier policy (u8 < 256 <= u16 < 65536 <= f32, error past 2^24) is
    deliberately replicated at every wire producer — here, _wire,
    load_count_wires' whole-plane narrowing, and _upload_wires_streaming's
    per-block _put — keep them in sync."""
    x = counts[:, :, allele]
    N, L = x.shape
    Lp = L + ((-L) % c)
    hi = int(x.max()) if x.size else 0
    lo = int(x.min()) if x.size else 0
    if x.size and hi < 65536 and lo >= 0:
        out = np.zeros((N, Lp), dtype=np.uint8 if hi < 256 else np.uint16)
        out[:, :L] = x
        return out
    if x.size and hi > 2**24:
        raise ValueError(
            "count plane exceeds 2^24; the f32 wire fallback would round "
            f"integer counts (max={hi})"
        )
    out = np.zeros((N, Lp), dtype=np.float32)
    out[:, :L] = x
    return out


def _wire_planes(data) -> tuple[np.ndarray, np.ndarray]:
    """The two padded upload planes for a CountData: free in wire mode
    (the loader already built exactly these), one _wire_plane pass each
    in plane mode."""
    wa = getattr(data, "wire_at", None)
    if wa is not None and wa.shape[1] % CHUNK == 0:
        return wa, data.wire_cg
    return (
        _wire_plane(data.max_counts, 0, CHUNK),
        _wire_plane(data.max_counts, 1, CHUNK),
    )


def _device_planes(data) -> tuple:
    """Device-resident count planes for the single-device paths: planes
    already uploaded during the parse (load_count_data_eval's streaming
    loader) when available, else one upload here."""
    dev = getattr(data, "dev_planes", None)
    if dev is not None:
        return dev
    a_np, b_np = _wire_planes(data)
    return jnp.asarray(a_np), jnp.asarray(b_np)


def _upload_wires_streaming(paths, block_rows: int = 256):
    """Parse count files into wire planes while uploading each finished
    256-row block to the device on a worker thread — the host parse
    (~6 ms/file) and the host->device plane transfer (the eval load
    phase's two big costs) overlap instead of serializing.

    Returns (wires_tuple, finish) or None when the wire loader can't
    apply (caller falls back to the plain loaders; any blocks already
    transferred are simply dropped).  finish() joins the in-flight
    transfers and returns (a_dev, b_dev) — deferred so the caller can run
    prepare() (a few host-seconds at cohort scale) while the tail blocks
    are still on the wire.  Per-block u8 narrowing matches
    load_count_wires' whole-plane tiering: a block rides the u8 wire iff
    its own max fits, and the device concat widens every block to the
    widest dtype seen."""
    from concurrent.futures import ThreadPoolExecutor

    from ntsm_tpu.io.countfile import load_count_wires

    futs: list = []
    ex = ThreadPoolExecutor(1)

    def _put(blk: np.ndarray):
        x = blk.astype(np.uint8) if int(blk.max()) < 256 else blk
        d = jnp.asarray(x)
        # real backpressure: one in-flight transfer at a time (deep
        # upload queues trip the tunnel client's inflight throttle)
        d.block_until_ready()
        return d

    def cb(s0, s1, wa_blk, wb_blk):
        futs.append((ex.submit(_put, wa_blk), ex.submit(_put, wb_blk)))

    try:
        wires = load_count_wires(paths, block_cb=cb, block_rows=block_rows)
    except BaseException:
        ex.shutdown(wait=True)
        raise
    if wires is None or not futs:
        ex.shutdown(wait=True)
        return None

    def finish():
        try:
            blocks = [(fa.result(), fb.result()) for fa, fb in futs]
        finally:
            # a failed block upload (tunnel drop, device OOM) must not
            # leak the non-daemon worker thread + its pinned blocks
            ex.shutdown(wait=True)
        wide = any(d.dtype == jnp.uint16 for pair in blocks for d in pair)
        dt = jnp.uint16 if wide else jnp.uint8
        a_d = jnp.concatenate([a.astype(dt) for a, _ in blocks], axis=0)
        b_d = jnp.concatenate([b.astype(dt) for _, b in blocks], axis=0)
        return a_d, b_d

    # abandon path (caller's prepare() raised): drop queued uploads,
    # join the in-flight one, free the worker thread
    finish.cancel = lambda: ex.shutdown(wait=True, cancel_futures=True)
    return wires, finish


def load_count_data_eval(paths, opts: Options) -> CountData:
    """CountData for the eval CLI: on the single-process device paths the
    plane upload rides the parse loop (_upload_wires_streaming), so the
    load phase costs max(parse, transfer) instead of their sum.  The
    exact engine, multi-host runs, merge-only mode, and -b debug defer to
    the plain loader (they never upload these planes, or shard them
    differently)."""
    from ntsm_tpu.eval.model import load_count_data

    if (
        getattr(opts, "engine", "tpu") == "exact"
        or len(paths) < 2
        or getattr(opts, "only_merge", False)
        or getattr(opts, "debug", False)
        or jax.process_count() > 1
        or _auto_mesh() is not None
    ):
        return load_count_data(paths, opts)
    res = _upload_wires_streaming(paths)
    if res is None:
        # the streaming attempt already ran the full wire parse; don't
        # let the plain loader repeat it before its plane fallbacks
        return load_count_data(paths, opts, try_wires=False)
    wires, finish = res
    locus_ids, distinct, wa, wb, site_acc, samp_mc, samp_sum, tks, kss = wires
    try:
        data = CountData(
            filenames=list(paths),
            locus_ids=locus_ids,
            distinct=distinct,
            raw_total_kmers=tks,
            ks=kss,
            total_counts=samp_mc,
            wire_at=wa,
            wire_cg=wb,
            site_acc=site_acc,
            samp_sum=samp_sum,
        ).prepare(opts)  # runs while the tail upload blocks are in flight
    except BaseException:
        finish.cancel()  # join the in-flight transfers, free the worker
        raise
    data.dev_planes = finish()
    return data


def _two_sum(hi, lo, p):
    """Compensated (Knuth two-sum) f32-pair accumulation.

    TPU f64 is software-emulated and a scan carrying an f64 accumulator ran
    ~1000x slower than this (28 s vs 0.03 s for the same [N, C, c] sums on
    v5e); the f32 hi/lo pair keeps ~2^-48 relative error, recombined in
    real f64 on the host."""
    s = hi + p
    z = s - hi
    e = (hi - (s - z)) + (p - z)
    return s, lo + e


def _chunked_matmul_f64(lhs, rhs):
    """sum_c lhs[:, c, :] @ rhs[:, c, :].T with compensated accumulation.

    lhs: [N, C, c] f32, rhs: [M, C, c] f32 -> (hi, lo) [N, M] f32 pair;
    combine as hi.astype(f64) + lo.astype(f64) on the host.
    """
    N = lhs.shape[0]
    M = rhs.shape[0]

    def body(acc, xs):
        lc, rc = xs  # [N, c], [M, c]
        # HIGHEST: on TPU the default f32 matmul runs in bf16 passes, which
        # rounds the (non-indicator) value planes; force full f32.
        part = jnp.dot(
            lc,
            rc.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        hi, lo = acc
        return _two_sum(hi, lo, part), None

    z0 = jnp.zeros((N, M), jnp.float32)
    acc, _ = jax.lax.scan(
        body, (z0, z0), (jnp.swapaxes(lhs, 0, 1), jnp.swapaxes(rhs, 0, 1))
    )
    return acc


def _make_joint_fn(min_cov: int):
    mc = jnp.float32(min_cov)

    @jax.jit
    def joint_rows(ai, bi, vi, a, b, v):
        """Joint accumulators (f32 hi/lo pairs) for a row tile:
        ai/bi/vi [C, T, c]; a/b/v [C, N, c]."""
        return _joint_tiles(ai, bi, vi, a, b, v, mc)

    return joint_rows


def _genotype_planes(x, y, mc, n_valid=None):
    """Indicator planes + single-sample likelihood planes from two count
    planes — the parity-critical construction (calcHomHetMiss +
    computeSumLogPSingle, CompareCounts.hpp:742-768,968-991), shared by
    the single-device and mesh-sharded engines.

    n_valid (static) masks the chunk-alignment pad columns beyond the
    real site count: their a = b = 0 rides the strict `> minCov` test
    (CompareCounts.hpp:746), which only excludes them while mc >= 0 — a
    negative -c would otherwise count every pad site as a valid n."""
    px = x > mc
    py = y > mc
    if n_valid is not None and int(n_valid) < x.shape[-1]:
        live = jnp.arange(x.shape[-1]) < n_valid
        px &= live
        py &= live
    het = (px & py).astype(jnp.float32)
    hom_at = (px & ~py).astype(jnp.float32)
    hom_cg = (~px & py).astype(jnp.float32)
    vall = (px | py).astype(jnp.float32)
    s_int = jnp.where(px, x, 0.0) + jnp.where(py, y, 0.0)
    tot = jnp.maximum(x + y, 1.0)
    s_frac = (px.astype(jnp.float32) + py.astype(jnp.float32)) * (x * y) / tot
    return het, hom_at, hom_cg, vall, s_int, s_frac


def _tally_matmuls(het_l, hom_at_l, hom_cg_l, vall_l, het, hom_at, hom_cg, vall):
    """The six [rows, N] indicator tallies (exact 0/1 f32 matmuls)."""
    f32mm = lambda x, y: jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    hom_l = hom_at_l + hom_cg_l
    hom = hom_at + hom_cg
    return dict(
        n=f32mm(vall_l, vall),
        shared_hets=f32mm(het_l, het),
        shared_homs=f32mm(hom_at_l, hom_at) + f32mm(hom_cg_l, hom_cg),
        ibs0=f32mm(hom_at_l, hom_cg) + f32mm(hom_cg_l, hom_at),
        hets1=f32mm(het_l, vall),
        homs1=f32mm(hom_l, vall),
    )


@functools.partial(jax.jit, static_argnames=("chunk", "mc", "n_valid"))
def _planes_and_tallies(a, b, *, mc: float, chunk: int, n_valid=None):
    """Everything derivable from the two count planes, on device:
    genotype indicator tallies (exact f32 matmuls of 0/1 planes),
    the single-sample likelihood planes and their pair sums (s1), and the
    chunked [C, N, c] layouts reused by the joint pass.

    Moving this off the host matters twice over: the host is 1 core here
    (f64 division over [N, L] was ~0.4 s per 16 samples), and the upload
    drops from six [N, L] planes to the two count planes.
    """
    a = a.astype(jnp.float32)  # u16 wire widens here (no-op for f32)
    b = b.astype(jnp.float32)
    N, Lp = a.shape
    C = Lp // chunk
    # indicator matmuls: inputs are exactly 0/1, so even the TPU's default
    # bf16 matmul passes are error-free; sums stay exact integers in f32
    # while below 2^24 (n_sites << 2^24).
    het, hom_at, hom_cg, vall, s_int, s_frac = _genotype_planes(
        a, b, mc, n_valid
    )
    tallies = _tally_matmuls(
        het, hom_at, hom_cg, vall, het, hom_at, hom_cg, vall
    )

    cshape = (N, C, chunk)
    v_c = vall.reshape(cshape)
    si_hi, si_lo = _chunked_matmul_f64(s_int.reshape(cshape), v_c)
    sf_hi, sf_lo = _chunked_matmul_f64(s_frac.reshape(cshape), v_c)
    s1 = (si_hi, si_lo, sf_hi, sf_lo)

    # exact integer part of the joint term, MXU-bound (see _joint_int_matmuls)
    jint = _joint_int_matmuls(a, b, vall, a, b, vall, mc, chunk)

    a_t = jnp.swapaxes(a.reshape(cshape), 0, 1)  # [C, N, c]
    b_t = jnp.swapaxes(b.reshape(cshape), 0, 1)
    v_t = jnp.swapaxes(v_c, 0, 1)
    return tallies, s1, jint, a_t, b_t, v_t


def _make_sharded_stats(mesh, *, min_cov: float, chunk: int, n_valid=None):
    """Sample-row-sharded pairwise statistics over a 1-D data mesh.

    Each device holds an [N/D, Lp] row block of the count planes,
    all_gathers the full planes (0.4 MB/sample - SURVEY §5's layout), and
    computes its row block of every [N, N] statistic: indicator-tally
    matmuls, the s1 plane sums, and the joint likelihood pass.  Outputs are
    row-sharded [N, N] arrays; no other collectives.
    """
    import functools as _ft

    from ntsm_tpu.parallel.mesh import P, shard_map

    mc = jnp.float32(min_cov)

    @_ft.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(
            dict(
                n=P("data"),
                shared_hets=P("data"),
                shared_homs=P("data"),
                ibs0=P("data"),
                hets1=P("data"),
                homs1=P("data"),
            ),
            (P("data"),) * 4,
            (P("data"),) * 4,
        ),
        check_rep=False,
    )
    def stats(a_l, b_l):
        # gather the (possibly u16) wire shards — half the ICI bytes —
        # and widen to f32 after the collective
        a = jax.lax.all_gather(a_l, "data", axis=0, tiled=True).astype(
            jnp.float32
        )
        b = jax.lax.all_gather(b_l, "data", axis=0, tiled=True).astype(
            jnp.float32
        )
        a_l = a_l.astype(jnp.float32)
        b_l = b_l.astype(jnp.float32)

        het_l, hat_l, hcg_l, val_l, sint_l, sfrac_l = _genotype_planes(
            a_l, b_l, mc, n_valid
        )
        het, hat, hcg, vall, _, _ = _genotype_planes(a, b, mc, n_valid)
        tallies = _tally_matmuls(het_l, hat_l, hcg_l, val_l, het, hat, hcg, vall)

        nl, Lp = a_l.shape
        C = Lp // chunk
        cl = (nl, C, chunk)
        cf = (a.shape[0], C, chunk)
        v_c = vall.reshape(cf)
        si = _chunked_matmul_f64(sint_l.reshape(cl), v_c)
        sf = _chunked_matmul_f64(sfrac_l.reshape(cl), v_c)

        # joint pass: this device's rows against everyone — the exact
        # integer part as matmuls, the fraction elementwise
        ji = _joint_int_matmuls(
            a_l, b_l, val_l, a, b, vall, float(min_cov), chunk
        )
        jf = _joint_tiles(
            jnp.swapaxes(a_l.reshape(cl), 0, 1),
            jnp.swapaxes(b_l.reshape(cl), 0, 1),
            jnp.swapaxes(val_l.reshape(cl), 0, 1),
            jnp.swapaxes(a.reshape(cf), 0, 1),
            jnp.swapaxes(b.reshape(cf), 0, 1),
            jnp.swapaxes(v_c, 0, 1),
            mc,
        )
        return tallies, (si[0], si[1], sf[0], sf[1]), (ji[0], ji[1], jf[0], jf[1])

    return jax.jit(stats)


def _joint_tiles(ai, bi, vi, a, b, v, mc):
    """FRACTIONAL joint-likelihood accumulators for a row block:
    ai/bi/vi [C, T, c] vs full [C, N, c] -> (hi, lo) [T, N] f32 pair.

    The integer part of the joint term is NOT computed here — it
    decomposes into indicator matmuls ([aa>mc]·aa = aa − Σ_{v≤mc} v·[aa=v])
    evaluated exactly on the MXU by _joint_int_matmuls; only the
    data-dependent fraction needs this O(N²·sites) elementwise pass."""
    T = ai.shape[1]
    N = a.shape[1]

    def body(acc, xs):
        aic, bic, vic, ac, bc, vc = xs
        aa = aic[:, None, :] + ac[None, :, :]
        bb = bic[:, None, :] + bc[None, :, :]
        m = vic[:, None, :] * vc[None, :, :]
        pa = aa > mc
        pb = bb > mc
        tot = jnp.maximum(aa + bb, 1.0)
        nf = pa.astype(jnp.float32) + pb.astype(jnp.float32)
        jfrac = ((nf * (aa * bb) / tot) * m).sum(-1)
        fh, fl = acc
        return _two_sum(fh, fl, jfrac), None

    z0 = jnp.zeros((T, N), jnp.float32)
    acc, _ = jax.lax.scan(body, (z0, z0), (ai, bi, vi, a, b, v))
    return acc


def _joint_int_matmuls(a_l, b_l, v_l, a_f, b_f, v_f, mc: float, chunk: int):
    """Exact integer part of the joint term via chunked matmuls, for a row
    block against the full cohort: [T, Lp] local planes vs [N, Lp] full.

    jint(i,j) = Σ_s m·([aa>mc]·aa + [bb>mc]·bb), aa = a_i+a_j. With integer
    counts, [aa>mc]·aa = aa − Σ_{v=1..t} v·[aa==v] where t = floor(mc), and
    [aa==v] = Σ_w [a_i==w]·[a_j==v−w] — all separable products, so each
    term is one compensated chunked matmul; values are integers, so the
    result is exact.  Returns (hi, lo) f32 pair [T, N]."""
    T, Lp = a_l.shape
    N = a_f.shape[0]
    C = Lp // chunk
    t = int(np.floor(mc))

    def cm(x, y):
        return _chunked_matmul_f64(
            x.reshape(x.shape[0], C, chunk), y.reshape(y.shape[0], C, chunk)
        )

    def acc(h1, l1, h2, l2):
        h, l = _two_sum(h1, l1, h2)
        return _two_sum(h, l, l2)

    # row terms Σ (a_i+b_i)·m and column terms Σ (a_j+b_j)·m
    hi, lo = cm((a_l + b_l) * v_l, v_f)
    hi, lo = acc(hi, lo, *cm(v_l, (a_f + b_f) * v_f))

    # corrections: − Σ_{v=1..t} v·[aa==v]·m (and same for bb); the −v scale
    # rides the indicator plane so per-chunk partials stay exact f32
    for pl_l, pl_f in ((a_l, a_f), (b_l, b_f)):
        eq_l = [
            (pl_l == jnp.float32(w)).astype(jnp.float32) * v_l
            for w in range(t + 1)
        ]
        eq_f = [
            (pl_f == jnp.float32(w)).astype(jnp.float32) * v_f
            for w in range(t + 1)
        ]
        for v in range(1, t + 1):
            for w in range(0, v + 1):
                hi, lo = acc(
                    hi, lo, *cm(eq_l[w] * jnp.float32(-v), eq_f[v - w])
                )
    return hi, lo


def _mesh_stat_planes(data, opts, mesh):
    """Row-sharded pairwise stat planes over the mesh: (tallies dict,
    s1 4-tuple, joint 4-tuple) of [Npad, N] device arrays.  On multi-host
    meshes each process feeds only its local row slice (assembled into
    one global array) and the in-kernel all_gather spans hosts via
    ICI/DCN; outputs stay row-sharded — run them through _replicate_tree
    before fetching."""
    N = data.n_samples
    a_np, b_np = _wire_planes(data)
    D = mesh.devices.size
    pad_n = (-N) % D
    if pad_n:  # zero-count pad rows produce n=0 pairs, sliced off later
        a_np = np.pad(a_np, ((0, pad_n), (0, 0)))
        b_np = np.pad(b_np, ((0, pad_n), (0, 0)))
    stats_fn = _make_sharded_stats(
        mesh, min_cov=float(opts.min_cov), chunk=CHUNK,
        n_valid=data.n_sites,
    )
    if jax.process_count() > 1 and mesh.devices.size > jax.local_device_count():
        from jax.sharding import NamedSharding

        from ntsm_tpu.parallel.mesh import P

        row_sh = NamedSharding(mesh, P("data", None))
        Npad = a_np.shape[0]
        rows_per = Npad // D
        # local slice: the rows owned by this process's devices (the
        # mesh is jax.devices() order, process-major)
        local_ids = {d.id for d in jax.local_devices()}
        mine = [i for i, d in enumerate(mesh.devices.flat) if d.id in local_ids]
        r_lo, r_hi = mine[0] * rows_per, (mine[-1] + 1) * rows_per
        a_g = jax.make_array_from_process_local_data(
            row_sh, a_np[r_lo:r_hi], a_np.shape
        )
        b_g = jax.make_array_from_process_local_data(
            row_sh, b_np[r_lo:r_hi], b_np.shape
        )
        tallies_d, s1_d, joint_d = stats_fn(a_g, b_g)
    else:
        tallies_d, s1_d, joint_d = stats_fn(
            jnp.asarray(a_np), jnp.asarray(b_np)
        )
    return tallies_d, s1_d, joint_d


def _replicate_tree(mesh, tree):
    """Reshard a tree of mesh outputs to replicated so every process can
    fetch them; no-op on single-process meshes (np.asarray can already
    assemble a row-sharded array there)."""
    if jax.process_count() > 1 and mesh.devices.size > jax.local_device_count():
        from jax.sharding import NamedSharding

        from ntsm_tpu.parallel.mesh import P

        rep = NamedSharding(mesh, P())
        return jax.jit(
            lambda t: t,
            out_shardings=jax.tree_util.tree_map(lambda _: rep, tree),
        )(tree)
    return tree


def _pack_mesh_blob(tallies_d, s1_d, joint_d, N: int, n_sites: int):
    """The packed-triangle blob from mesh stat planes: the same (ll, ints,
    hi) wire as _blob_from_planes, built under one jit over the sharded
    [Npad, N] planes (XLA inserts the gathers/collectives) — the fetch
    drops from fourteen [N, N] f32 planes (~574 MB at N=3202) to ~25
    B/pair (~128 MB), the same discipline as the single-device path.
    Tier bound: n_sites, same as _blob_from_planes (pads are n_valid-
    masked)."""
    narrow = n_sites <= NARROW_WIRE_MAX_SITES

    @jax.jit
    def pack(t, s, j):
        sl = lambda x: x[:N, :N]  # noqa: E731
        return _pack_triangle(
            {k: sl(v) for k, v in t.items()},
            tuple(sl(x) for x in s),
            (sl(j[0]), sl(j[1])),
            sl(j[2]),
            sl(j[3]),
            narrow=narrow,
        )

    return pack(tallies_d, s1_d, joint_d)


def compute_pair_stats_tpu(
    data: CountData, opts: Options, mesh=None, packed: bool = False
) -> dict:
    """All [N, N] pairwise statistics on device; with `mesh`, the sample
    rows are sharded over the 1-D data mesh (each device scores its row
    block against the all_gather'ed planes).

    With `packed`, the i<j triangle of every statistic is gathered ON
    DEVICE into an (ll f32[2,P], ints u16[8,P], hi u8[P]) blob and fetched in three arrays per chunk instead of fourteen [N, N]
    planes — the score phase is device->host-fetch-bound on the tunneled
    runtime, and this cuts fetched bytes ~7x (the symmetric half of every
    plane, the 4 s1 planes folded to a compensated log-likelihood pair,
    hi/lo joint planes combined, integer stats narrowed to u16 low halves
    + a high-bit byte) and turns ~110 transfers into 3 per STREAM_PAIRS
    chunk.  (A single bitcast-concatenated byte buffer would make it 1
    fetch/chunk for ~0.5 s at N=3202; skipped — recorded negative:
    endianness-fragile for the gain.)  Returns per-pair vectors (see
    _finalize_packed)."""
    N = data.n_samples
    if mesh is not None:
        tallies_d, s1_d, joint_d = _mesh_stat_planes(data, opts, mesh)
        if packed and N >= 2:
            parts = _pack_mesh_blob(tallies_d, s1_d, joint_d, N, data.n_sites)
            parts = _replicate_tree(mesh, parts)
            P_ = (N * (N - 1)) // 2
            buf = _fetch_blob_slice(parts, 0, P_)
            iu, ju = np.triu_indices(N, 1)
            return dict(packed=True, iu=iu, ju=ju,
                        **_finalize_packed(data, opts, buf, iu, ju))
        tallies_d, s1_d, joint_d = _replicate_tree(
            mesh, (tallies_d, s1_d, joint_d)
        )
        sl = np.s_[:N, :N]
        tallies = {
            k: np.asarray(v).astype(np.int64)[sl] for k, v in tallies_d.items()
        }
        si_hi, si_lo, sf_hi, sf_lo = (
            np.asarray(x).astype(np.float64)[sl] for x in s1_d
        )
        s1 = (si_hi + si_lo) - (sf_hi + sf_lo)
        ih, il, fh, fl = (
            np.asarray(x).astype(np.float64)[sl] for x in joint_d
        )
        J = (ih + il) - (fh + fl)
        return _finalize_stats(data, opts, tallies, s1, J)

    tallies_d, s1_d, jint_d, a_d, b_d, v_t = _planes_and_tallies(
        *_device_planes(data),
        mc=float(opts.min_cov),
        chunk=CHUNK,
        n_valid=data.n_sites,
    )
    import os as _os

    if (
        not packed  # the packed contract (iu/ju per-pair vectors) wins
        and jax.default_backend() in ("tpu", "axon")
        and _os.environ.get("NTSM_PALLAS_JOINT", "").lower()
        in ("1", "true", "yes")
    ):
        # opt-in experiment: one Pallas dispatch for the whole [N, N]
        # fractional pass.  Measured SLOWER than the XLA row-tile loop
        # (1.51 s vs 0.92 s at N=1024, value-fetch-inclusive — see
        # eval/pallas_joint.py for the record), so XLA is the default.
        tallies, s1, jint = _fetch_full(tallies_d, s1_d, jint_d)
        fh_d, fl_d = _joint_frac_pallas(a_d, b_d, v_t, float(opts.min_cov))
        J = jint - (
            np.asarray(fh_d).astype(np.float64)
            + np.asarray(fl_d).astype(np.float64)
        )
        return _finalize_stats(data, opts, tallies, s1, J)

    if packed and N >= 2:
        parts = _blob_from_planes(tallies_d, s1_d, jint_d,
                                  a_d, b_d, v_t, opts, N, data.n_sites)
        P = (N * (N - 1)) // 2
        buf = _fetch_blob_slice(parts, 0, P)
        iu, ju = np.triu_indices(N, 1)
        return dict(packed=True, iu=iu, ju=ju,
                    **_finalize_packed(data, opts, buf, iu, ju))

    joint_fn = _make_joint_fn(opts.min_cov)
    tallies, s1, jint = _fetch_full(tallies_d, s1_d, jint_d)
    J = np.zeros((N, N), np.float64)
    for r0 in range(0, N, ROW_TILE):
        r1 = min(r0 + ROW_TILE, N)
        ai, bi, vi = _joint_row_tile(a_d, b_d, v_t, r0, N)
        fh, fl = (
            np.asarray(x).astype(np.float64)
            for x in joint_fn(ai, bi, vi, a_d, b_d, v_t)
        )
        J[r0:r1] = jint[r0:r1] - ((fh + fl)[: r1 - r0])

    return _finalize_stats(data, opts, tallies, s1, J)


def _fetch_full(tallies_d, s1_d, jint_d):
    """Host fetch + f64 combine of the full [N, N] planes (the unpacked
    path; the mesh and Pallas-experiment branches share it)."""
    tallies = {k: np.asarray(v).astype(np.int64) for k, v in tallies_d.items()}
    si_hi, si_lo, sf_hi, sf_lo = (np.asarray(x).astype(np.float64) for x in s1_d)
    s1 = (si_hi + si_lo) - (sf_hi + sf_lo)
    jint = np.asarray(jint_d[0]).astype(np.float64) + np.asarray(
        jint_d[1]
    ).astype(np.float64)
    return tallies, s1, jint


@functools.partial(jax.jit, static_argnames=("narrow",))
def _pack_triangle(tallies, s1, jint, jfh, jfl, narrow: bool):
    """Gather the i<j triangle of every per-pair statistic on device
    (P = N(N-1)/2, row-major pair order — matches np.triu_indices(N, 1)).

    Returns (ll [2, P] f32, ints, hi) where ints holds [n, ibs0,
    shared_hets, shared_homs, hets1, hets2, homs1, homs2]:

    * narrow wire (every statistic < 2¹⁷, i.e. n_sites ≤ 131071 — 1.4x
      the human site set): ints is u16 low halves and hi is a [P] u8
      whose bit k carries statistic k's 2¹⁶ bit — 25 B/pair on the wire
      vs 40 for the all-f32 blob, a 37% cut on the fetch-bound phase.
    * wide fallback: ints is the exact-integer f32 stack, hi is None.

    The log-likelihood −2·(J − s1 − s1ᵀ) (CompareCounts.hpp:1093-1099) is
    folded from its six hi/lo source planes with compensated pair
    arithmetic (~2⁻⁴⁸ relative, same class as the host f64 combine it
    replaces).  This replaces fourteen [N, N] fetches + two per row tile
    — the score phase is fetch-bound."""
    n_plane = tallies["n"]
    N = n_plane.shape[0]
    P = (N * (N - 1)) // 2
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    flat = jnp.flatnonzero((jj > ii).reshape(-1), size=P, fill_value=0)
    tflat = (flat % N) * N + flat // N  # transpose gather: (j, i)
    g = lambda x: x.reshape(-1)[flat]  # noqa: E731
    gt = lambda x: x.reshape(-1)[tflat]  # noqa: E731

    def dd_sub(h1, l1, h2, l2):
        h, l = _two_sum(h1, l1, -h2)
        return _two_sum(h, l, -l2)

    si_hi, si_lo, sf_hi, sf_lo = s1
    jh, jl = dd_sub(g(jint[0]), g(jint[1]), g(jfh), g(jfl))
    s1ij = dd_sub(g(si_hi), g(si_lo), g(sf_hi), g(sf_lo))
    s1ji = dd_sub(gt(si_hi), gt(si_lo), gt(sf_hi), gt(sf_lo))
    dh, dl = dd_sub(jh, jl, *s1ij)
    dh, dl = dd_sub(dh, dl, *s1ji)
    ll = jnp.stack([-2.0 * dh, -2.0 * dl])
    ints = jnp.stack(
        [
            g(n_plane),
            g(tallies["ibs0"]),
            g(tallies["shared_hets"]),
            g(tallies["shared_homs"]),
            g(tallies["hets1"]),
            gt(tallies["hets1"]),
            g(tallies["homs1"]),
            gt(tallies["homs1"]),
        ]
    )
    if not narrow:
        return ll, ints.astype(jnp.float32), None
    iv = ints.astype(jnp.int32)
    lo = (iv & 0xFFFF).astype(jnp.uint16)
    hi = jnp.sum(
        (iv >> 16).astype(jnp.uint8) << jnp.arange(8, dtype=jnp.uint8)[:, None],
        axis=0,
        dtype=jnp.uint8,
    )
    return ll, lo, hi


def _unpack_blob(ll, ints, hi):
    """Host-side inverse of _pack_triangle's wire: (ll [2,p], iv [8,p]
    int64) from fetched numpy parts."""
    if hi is not None:
        iv = ints.astype(np.int64)
        iv += (
            (hi[None, :].astype(np.int64) >> np.arange(8)[:, None]) & 1
        ) << 16
    else:
        iv = ints.astype(np.int64)
    return ll, iv


def _blob_from_planes(tallies_d, s1_d, jint_d, a_d, b_d, v_t, opts, N,
                      n_sites: int):
    """Device triangle blob parts for the packed path: runs the joint
    fractional row tiles device-resident (no per-tile fetch) and gathers
    the i<j triangle of every statistic.  Returns the (lazy)
    (ll, ints, hi) device tuple of _pack_triangle — callers fetch it
    whole or stream it in P-chunks."""
    joint_fn = _make_joint_fn(opts.min_cov)
    tiles = []
    for r0 in range(0, N, ROW_TILE):
        ai, bi, vi = _joint_row_tile(a_d, b_d, v_t, r0, N)
        tiles.append(joint_fn(ai, bi, vi, a_d, b_d, v_t))
    jfh = jnp.concatenate([t[0] for t in tiles], axis=0)
    jfl = jnp.concatenate([t[1] for t in tiles], axis=0)
    # every statistic is bounded by n <= n_sites (pad columns are masked
    # out of the genotype planes by n_valid, for every -c), so the
    # u16+highbit wire is exact iff the site count fits 17 bits (1.4x the
    # human set).  NB: a_d here is the [C, N, c] chunked layout — its
    # last dim is CHUNK, never use it as a site-count bound.
    return _pack_triangle(
        tallies_d, s1_d, jint_d, jfh[:N], jfl[:N],
        narrow=n_sites <= NARROW_WIRE_MAX_SITES,
    )


def _fetch_blob_slice(parts, p0: int, p1: int):
    """Fetch one [p0:p1) pair slice of the (ll, ints, hi) blob parts to
    host numpy (the hi row may be None on the wide wire)."""
    ll, ints, hi = parts
    return (
        np.asarray(ll[:, p0:p1]),
        np.asarray(ints[:, p0:p1]),
        None if hi is None else np.asarray(hi[p0:p1]),
    )


def _finalize_packed(data, opts, buf, iu, ju) -> dict:
    """Per-pair stats from fetched blob parts whose pairs are
    (iu[k], ju[k]): same skew / DBL_MAX semantics as _finalize_stats,
    np.triu_indices(N, 1) pair order (hets2/homs2 are transpose gathers)."""
    llp, iv = _unpack_blob(*buf)
    ll = llp[0].astype(np.float64) + llp[1].astype(np.float64)
    n = iv[0]
    cov = data.cov
    with np.errstate(divide="ignore", invalid="ignore"):
        skewed = ll / (cov[iu] * cov[ju]) ** opts.cov_skew
        score = np.where(n > 0, skewed / np.maximum(n, 1.0), DBL_MAX)
    return dict(
        score=score,
        n=n,
        ibs0=iv[1],
        shared_hets=iv[2],
        shared_homs=iv[3],
        hets1=iv[4],
        hets2=iv[5],
        homs1=iv[6],
        homs2=iv[7],
    )


def _joint_row_tile(a_d, b_d, v_t, r0: int, N: int):
    """One ROW_TILE-wide slice of the chunked [C, N, c] planes, zero-padded
    to the fixed tile width so every joint dispatch shares one compile."""
    r1 = min(r0 + ROW_TILE, N)
    ai = a_d[:, r0:r1]
    bi = b_d[:, r0:r1]
    vi = v_t[:, r0:r1]
    if r1 - r0 < ROW_TILE:
        padw = ((0, 0), (0, ROW_TILE - (r1 - r0)), (0, 0))
        ai = jnp.pad(ai, padw)
        bi = jnp.pad(bi, padw)
        vi = jnp.pad(vi, padw)
    return ai, bi, vi


@functools.partial(jax.jit, static_argnames=("mc",))
def _joint_frac_pallas(a_t, b_t, v_t, mc: float):
    """[C, N, c] chunked planes -> full [N, N] fractional joint (hi, lo)
    via the Pallas kernel (eval/pallas_joint.py)."""
    from ntsm_tpu.eval.pallas_joint import joint_frac_full

    def rows(x):  # [C, N, c] -> [N, Lp] in original site order
        return jnp.swapaxes(x, 0, 1).reshape(x.shape[1], -1)

    return joint_frac_full(rows(a_t), rows(b_t), rows(v_t), mc)


def _finalize_stats(data, opts, tallies, s1, J) -> dict:
    loglik = -2.0 * (J - s1 - s1.T)
    cov = data.cov
    with np.errstate(divide="ignore", invalid="ignore"):
        skewed = loglik / (cov[:, None] * cov[None, :]) ** opts.cov_skew
        nmat = tallies["n"].astype(np.float64)
        score = np.where(nmat > 0, skewed / np.maximum(nmat, 1.0), DBL_MAX)

    return dict(score=score, **tallies)


PAIR_BLOCK = 4096  # candidate pairs per device invocation (-p path)


@functools.partial(jax.jit, static_argnames=("chunk", "mc", "n_valid"))
def _pair_block_stats(A, B, ii, jj, *, mc: float, chunk: int, n_valid=None):
    """Per-pair statistics for one block of candidate pairs (-p path).

    A/B: [N, Lp] f32 count planes; ii/jj: [P] int32 pair indices.  The
    rows are gathered on device and every statistic reduces over sites
    elementwise — no O(N²) matrix is formed, so scoring cost is
    O(P · sites) for exactly the candidate pairs the kd-tree-equivalent
    search produced (reference scores candidates one pair at a time,
    CompareCounts.hpp:335-356).

    Tallies are indicator sums (exact in f32 below 2^24); s1 and the
    joint terms use the same per-chunk-f32 + two-sum accumulation as the
    all-vs-all engine, so -p and -a device scores are identical for the
    same pair.
    """
    mcf = jnp.float32(mc)
    # gather on the (possibly u16) wire dtype, widen the gathered rows
    a_i, b_i = A[ii].astype(jnp.float32), B[ii].astype(jnp.float32)
    a_j, b_j = A[jj].astype(jnp.float32), B[jj].astype(jnp.float32)
    het1, hat1, hcg1, val1, sint1, sfrac1 = _genotype_planes(
        a_i, b_i, mcf, n_valid
    )
    het2, hat2, hcg2, val2, sint2, sfrac2 = _genotype_planes(
        a_j, b_j, mcf, n_valid
    )
    m = val1 * val2

    def isum(x):  # exact integer-valued f32 reduction
        return x.sum(axis=1)

    tallies = dict(
        n=isum(m),
        shared_hets=isum(het1 * het2),
        shared_homs=isum(hat1 * hat2 + hcg1 * hcg2),
        ibs0=isum(hat1 * hcg2 + hcg1 * hat2),
        hets1=isum(het1 * val2),
        homs1=isum((hat1 + hcg1) * val2),
        hets2=isum(het2 * val1),
        homs2=isum((hat2 + hcg2) * val1),
    )

    P, Lp = a_i.shape
    C = Lp // chunk

    def cview(x):
        return jnp.swapaxes(x.reshape(P, C, chunk), 0, 1)  # [C, P, c]

    def body(acc, xs):
        ai_c, bi_c, aj_c, bj_c, m_c, s1_c = xs
        aa = ai_c + aj_c
        bb = bi_c + bj_c
        paa = aa > mcf
        pbb = bb > mcf
        jint_p = ((jnp.where(paa, aa, 0.0) + jnp.where(pbb, bb, 0.0)) * m_c).sum(-1)
        tot = jnp.maximum(aa + bb, 1.0)
        nf = paa.astype(jnp.float32) + pbb.astype(jnp.float32)
        jfrac_p = ((nf * (aa * bb) / tot) * m_c).sum(-1)
        s1_p = (s1_c * m_c).sum(-1)
        (jih, jil), (jfh, jfl), (s1h, s1l) = acc
        return (
            _two_sum(jih, jil, jint_p),
            _two_sum(jfh, jfl, jfrac_p),
            _two_sum(s1h, s1l, s1_p),
        ), None

    s1_plane = (sint1 - sfrac1) + (sint2 - sfrac2)
    z = jnp.zeros((P,), jnp.float32)
    acc, _ = jax.lax.scan(
        body,
        ((z, z), (z, z), (z, z)),
        (cview(a_i), cview(b_i), cview(a_j), cview(b_j), cview(m), cview(s1_plane)),
    )
    (jih, jil), (jfh, jfl), (s1h, s1l) = acc
    # one [14, P] blob per block: a single device->host fetch instead of
    # fourteen (each fetch on the tunneled runtime pays a fixed RTT)
    return jnp.stack(
        [
            tallies["n"],
            tallies["shared_hets"],
            tallies["shared_homs"],
            tallies["ibs0"],
            tallies["hets1"],
            tallies["homs1"],
            tallies["hets2"],
            tallies["homs2"],
            jih,
            jil,
            jfh,
            jfl,
            s1h,
            s1l,
        ]
    )


def compute_score_pca_tpu(data: CountData, opts: Options, out, cloud) -> None:
    """Device-batched PCA-filtered comparison: identical candidate set and
    emission order to compute_score_pca (eval/driver.py), pair scoring in
    PAIR_BLOCK batches on the device instead of the host pair loop.

    Score agreement with the exact engine matches the -a device engine
    (~1e-9 relative, identical tallies); use --engine exact for bit-level
    output parity.
    """
    from ntsm_tpu.eval.pca import pca_candidates, search_radii

    radii = search_radii(data, opts)
    out.write(HEADER)
    out.write("\n")
    pairs = list(pca_candidates(cloud, radii, opts.dim))
    if not pairs:
        return

    A, B = _device_planes(data)
    cov = data.cov.astype(np.float64)

    emit_native = _load_row_formatter()
    samp_cache = _sample_strings(data) if emit_native is not None else None

    from concurrent.futures import ThreadPoolExecutor

    def _dispatch(blk0: int):
        blk = pairs[blk0 : blk0 + PAIR_BLOCK]
        P = len(blk)
        ii = np.fromiter((p[0] for p in blk), np.int32, P)
        jj = np.fromiter((p[1] for p in blk), np.int32, P)
        if P < PAIR_BLOCK:  # pad for a single compiled shape
            ii = np.pad(ii, (0, PAIR_BLOCK - P), constant_values=ii[0])
            jj = np.pad(jj, (0, PAIR_BLOCK - P), constant_values=jj[0])
        dev = _pair_block_stats(
            A, B, jnp.asarray(ii), jnp.asarray(jj),
            mc=float(opts.min_cov), chunk=CHUNK, n_valid=data.n_sites,
        )
        return ii, jj, P, dev

    # one-block pipeline: block k+1 is dispatched (device computes) and
    # fetched (on the worker thread) while the host finalizes and formats
    # block k — the same fetch/format overlap as the -a streamed path
    def _fetch(dev):
        return np.asarray(dev).astype(np.float64)

    fetch_ex = ThreadPoolExecutor(1)
    try:
        pend = _dispatch(0)
        fut = fetch_ex.submit(_fetch, pend[3])
        for blk0 in range(0, len(pairs), PAIR_BLOCK):
            ii, jj, P, _ = pend
            blob_fut = fut
            if blk0 + PAIR_BLOCK < len(pairs):
                pend = _dispatch(blk0 + PAIR_BLOCK)
                fut = fetch_ex.submit(_fetch, pend[3])
            blob = blob_fut.result()
            _emit_pca_block(
                data, opts, out, cov, emit_native, samp_cache, cloud,
                ii, jj, P, blob,
            )
    finally:
        fetch_ex.shutdown(wait=True)


def _emit_pca_block(data, opts, out, cov, emit_native, samp_cache, cloud,
                    ii, jj, P, blob) -> None:
    """Host finalize + emission for one fetched [14, PAIR_BLOCK] -p blob
    (the loop body of compute_score_pca_tpu, split out so the pipeline
    can run it while the next block is in flight)."""
    from ntsm_tpu.eval.pca import calc_distance_sq
    from ntsm_tpu.utils.formats import cpp_to_string

    tallies = {
        k: blob[r, :P].astype(np.int64)
        for r, k in enumerate(
            (
                "n",
                "shared_hets",
                "shared_homs",
                "ibs0",
                "hets1",
                "homs1",
                "hets2",
                "homs2",
            )
        )
    }
    J = ((blob[8] + blob[9]) - (blob[10] + blob[11]))[:P]
    s1 = (blob[12] + blob[13])[:P]
    loglik = -2.0 * (J - s1)
    iv = ii[:P].astype(np.int64)
    jv = jj[:P].astype(np.int64)
    nvec = tallies["n"]
    with np.errstate(divide="ignore", invalid="ignore"):
        score_v = np.where(
            nvec > 0,
            loglik
            / (cov[iv] * cov[jv]) ** opts.cov_skew
            / np.maximum(nvec, 1).astype(np.float64),
            DBL_MAX,
        )
    if emit_native is not None:
        keep = (
            np.ones(P, dtype=bool)
            if opts.all
            else score_v < opts.score_thresh
        )
        kk = np.nonzero(keep)[0]
        if kk.size:
            same = (
                np.where(
                    score_v[kk] < opts.score_thresh, ord("1"), ord("0")
                ).astype(np.uint8)
                if opts.all
                else np.full(kk.size, ord("1"), dtype=np.uint8)
            )
            f3, i9 = _pair_columns(
                score_v[kk],
                tallies["ibs0"][kk],
                tallies["shared_hets"][kk],
                tallies["shared_homs"][kk],
                tallies["hets1"][kk],
                tallies["hets2"][kk],
                tallies["homs1"][kk],
                tallies["homs2"][kk],
                nvec[kk],
            )
            d = (
                cloud[iv[kk], : opts.dim] - cloud[jv[kk], : opts.dim]
            )
            dist_v = (d * d).sum(axis=1)
            _emit_rows_native(
                emit_native, data, out,
                np.ascontiguousarray(iv[kk].astype(np.int32)),
                np.ascontiguousarray(jv[kk].astype(np.int32)),
                f3, i9, same, dist_v, samp_w=samp_cache,
            )
        return
    for t in range(P):
        i, k = int(iv[t]), int(jv[t])
        n = int(tallies["n"][t])
        score = float(score_v[t])
        if not (opts.all or score < opts.score_thresh):
            continue
        r = Relate(
            ibs0=int(tallies["ibs0"][t]),
            ibs2=int(tallies["shared_hets"][t] + tallies["shared_homs"][t]),
            shared_homs=int(tallies["shared_homs"][t]),
            shared_hets=int(tallies["shared_hets"][t]),
            hets1=int(tallies["hets1"][t]),
            homs1=int(tallies["homs1"][t]),
            hets2=int(tallies["hets2"][t]),
            homs2=int(tallies["homs2"][t]),
        )
        r.hom_concord = cpp_div(
            float(r.shared_homs) - 2.0 * float(r.ibs0),
            float(min(r.homs1, r.homs2)),
        )
        r.relatedness = cpp_div(
            float(r.shared_hets) - 2.0 * float(r.ibs0),
            float(min(r.hets1, r.hets2)),
        )
        dist = cpp_to_string(calc_distance_sq(cloud, i, k, opts.dim))
        res = PairResult(i=i, j=k, score=score, n=n, relate=r)
        out.write(results_row(data, res, dist, opts))
        out.write("\n")


def _auto_mesh():
    """The 1-D data mesh for eval sharding: the GLOBAL device mesh in
    multi-process mode (every process participates in the row-sharded
    stats — see the multi-host branch in compute_pair_stats_tpu), all
    local devices on a single process (a pod slice / the virtual CPU
    mesh), or None on a single chip."""
    from ntsm_tpu.parallel.mesh import data_mesh

    if jax.process_count() > 1:
        return data_mesh(jax.devices())
    if jax.local_device_count() > 1:
        return data_mesh(jax.local_devices())
    return None


def _load_row_formatter():
    """The native row-formatter lib, or None (Python per-row fallback)."""
    from ntsm_tpu import native

    lib = native.load()
    if lib is None or not hasattr(lib, "ntsm_format_eval_rows"):
        return None
    return lib


def _emit_pair_chunk(data, opts, out, iu, ju, sc, cols, lib, samp_w,
                     dist=None):
    """Emit one block of all-vs-all rows from per-pair vectors — THE
    shared emission path (the exact engine's _emit_pairs delegates here).

    Applies the -a / score-threshold filtering and the quirky `same`
    column semantics (CompareCounts.hpp:853-861), then formats through the
    native C formatter (~1 us/row — the Python path is ~10-50 us/row,
    minutes for an N=3202 cohort) or the per-row Python fallback.  Byte-
    identical both ways: float columns are glibc "%f"
    (utils/formats.py:cpp_to_string) and relate/homConcord are the same
    IEEE f64 divisions.  dist is the -p path's per-pair f64 column or
    None for "-1"."""
    from ntsm_tpu.utils.formats import cpp_to_string

    if opts.all:
        same = np.where(
            sc < opts.score_thresh, ord("1"), ord("0")
        ).astype(np.uint8)
    else:
        keep = sc < opts.score_thresh
        iu, ju, sc = iu[keep], ju[keep], sc[keep]
        cols = [c[keep] for c in cols]
        if dist is not None:
            dist = dist[keep]
        # without -a only passing pairs print, hard-coded "1"
        same = np.full(iu.shape[0], ord("1"), dtype=np.uint8)
    P = int(iu.shape[0])
    if P == 0:
        return

    if lib is not None:
        f3, i9 = _pair_columns(sc, *cols)
        ii = np.ascontiguousarray(iu.astype(np.int32))
        jj = np.ascontiguousarray(ju.astype(np.int32))
        dd = None if dist is None else np.ascontiguousarray(dist)
        _emit_rows_native(lib, data, out, ii, jj, f3, i9, same, dd, samp_w)
        return

    ibs0, shet, shom, h1, h2, o1, o2, n = cols
    for p in range(P):
        r = Relate(
            ibs0=int(ibs0[p]),
            ibs2=int(shet[p] + shom[p]),
            shared_homs=int(shom[p]),
            shared_hets=int(shet[p]),
            hets1=int(h1[p]),
            homs1=int(o1[p]),
            hets2=int(h2[p]),
            homs2=int(o2[p]),
        )
        r.hom_concord = cpp_div(
            float(r.shared_homs) - 2.0 * float(r.ibs0),
            float(min(r.homs1, r.homs2)),
        )
        r.relatedness = cpp_div(
            float(r.shared_hets) - 2.0 * float(r.ibs0),
            float(min(r.hets1, r.hets2)),
        )
        res = PairResult(
            i=int(iu[p]), j=int(ju[p]), score=float(sc[p]),
            n=int(n[p]), relate=r,
        )
        d = "-1" if dist is None else cpp_to_string(float(dist[p]))
        out.write(results_row(data, res, d, opts))
        out.write("\n")


def _triangle_vectors(stats, N):
    """(iu, ju, score, [ibs0, shet, shom, h1, h2, o1, o2, n]) per-pair
    vectors in np.triu_indices order, from either a packed or a
    full-matrix stats dict."""
    if stats.get("packed"):
        cols = [stats[k] for k in PAIR_COL_KEYS]
        return stats["iu"], stats["ju"], stats["score"], cols
    iu, ju = np.triu_indices(N, 1)
    cols = [
        stats["ibs0"][iu, ju],
        stats["shared_hets"][iu, ju],
        stats["shared_homs"][iu, ju],
        stats["hets1"][iu, ju],
        stats["hets1"][ju, iu],
        stats["homs1"][iu, ju],
        stats["homs1"][ju, iu],
        stats["n"][iu, ju],
    ]
    return iu, ju, stats["score"][iu, ju], cols


def _sample_strings(data):
    """[N, 6] fixed-width per-sample byte columns (formatted once):
    fname, cov, errorRate, miss, homs, hets."""
    from ntsm_tpu.utils.formats import cpp_to_string

    N = data.n_samples
    rows = [
        [
            str(data.filenames[s]).encode("utf-8"),
            cpp_to_string(float(data.cov[s])).encode(),
            cpp_to_string(float(data.error_rate[s])).encode(),
            str(int(data.miss[s])).encode(),
            str(int(data.homs[s])).encode(),
            str(int(data.hets[s])).encode(),
        ]
        for s in range(N)
    ]
    # width in BYTES (filenames may be non-ASCII UTF-8)
    w = max(len(x) for r in rows for x in r) + 1
    samp = np.zeros((N, 6), dtype=f"S{w}")
    for s, r in enumerate(rows):
        for c, x in enumerate(r):
            samp[s, c] = x
    return np.ascontiguousarray(samp), w


def _pair_columns(score, ibs0, shet, shom, h1, h2, o1, o2, n):
    """The (f3, i9) column-order contract of ntsm_format_eval_rows,
    assembled from per-pair vectors — ONE copy shared by the -a and -p
    paths (relate/homConcord are the same IEEE f64 divisions as the
    per-row cpp_div)."""
    P = score.shape[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        relate = (shet - 2.0 * ibs0) / np.minimum(h1, h2).astype(np.float64)
        homc = (shom - 2.0 * ibs0) / np.minimum(o1, o2).astype(np.float64)
    f3 = np.empty((P, 3), np.float64)
    f3[:, 0] = score
    f3[:, 1] = relate
    f3[:, 2] = homc
    i9 = np.empty((P, 9), np.int64)
    i9[:, 0] = ibs0
    i9[:, 1] = shet + shom  # ibs2
    i9[:, 2] = h1
    i9[:, 3] = h2
    i9[:, 4] = shet
    i9[:, 5] = o1
    i9[:, 6] = o2
    i9[:, 7] = shom
    i9[:, 8] = n
    return f3, i9


def _emit_rows_native(lib, data, out, ii, jj, f3, i9, same, dist, samp_w=None):
    """Chunked native emission of prepared per-pair arrays (shared by the
    -a and -p paths); dist is an f64 array for -p or None for the "-1"
    column of -a."""
    import ctypes

    samp, w = samp_w if samp_w is not None else _sample_strings(data)
    N = data.n_samples
    P = int(ii.shape[0])
    CHROWS = 131072
    cap = min(P, CHROWS) * 384 + 8192
    buf = np.empty(cap, dtype=np.uint8)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
    for c0 in range(0, P, CHROWS):
        c1 = min(c0 + CHROWS, P)
        blk = c1 - c0
        f3b = np.ascontiguousarray(f3[c0:c1])
        i9b = np.ascontiguousarray(i9[c0:c1])
        db = None if dist is None else np.ascontiguousarray(dist[c0:c1])
        while True:
            nb = lib.ntsm_format_eval_rows(
                blk, vp(ii[c0:c1]), vp(jj[c0:c1]), vp(f3b), vp(i9b),
                vp(same[c0:c1]), (None if db is None else vp(db)),
                vp(samp), w, N, vp(buf), buf.shape[0],
            )
            if nb >= 0:
                break
            # pathological rows (e.g. DBL_MAX scores print 316 chars/field)
            buf = np.empty(buf.shape[0] * 4, dtype=np.uint8)
        out.write(buf[:nb].tobytes().decode("utf-8"))


STREAM_PAIRS = 1 << 20  # packed-blob pairs per fetch chunk (~25 MB narrow)
NARROW_WIRE_MAX_SITES = (1 << 17) - 1  # u16+highbit wire validity bound

# the _emit_pair_chunk cols order (also _triangle_vectors' return order)
PAIR_COL_KEYS = (
    "ibs0", "shared_hets", "shared_homs",
    "hets1", "hets2", "homs1", "homs2", "n",
)


def compute_score_all_tpu(data: CountData, opts: Options, out) -> None:
    """All-vs-all output identical in layout to the exact engine."""
    mesh = _auto_mesh()
    out.write(HEADER)
    out.write("\n")
    if data.n_samples >= 2:
        _stream_packed_rows(data, opts, out, mesh=mesh)
        return
    stats = compute_pair_stats_tpu(data, opts, mesh=mesh)
    iu, ju, sc, cols = _triangle_vectors(stats, data.n_samples)
    lib = _load_row_formatter()
    samp_w = _sample_strings(data) if lib is not None else None
    _emit_pair_chunk(data, opts, out, iu, ju, sc, cols, lib, samp_w)


def _stream_packed_rows(data: CountData, opts: Options, out, mesh=None) -> None:
    """All-vs-all: fetch the device triangle blob in STREAM_PAIRS chunks
    on a prefetch thread while the host finalizes and formats the
    previous chunk — device->host transfer (the score-phase bound on the
    tunneled runtime) overlaps the ~1 us/row native formatting.  Emission
    order is row-major i<j, identical to the unstreamed path.  With
    `mesh` the blob is packed from the row-sharded stat planes
    (_pack_mesh_blob) — same wire, same streaming."""
    from concurrent.futures import ThreadPoolExecutor

    N = data.n_samples
    if mesh is not None:
        tallies_m, s1_m, joint_m = _mesh_stat_planes(data, opts, mesh)
        parts = _replicate_tree(
            mesh, _pack_mesh_blob(tallies_m, s1_m, joint_m, N, data.n_sites)
        )
    else:
        tallies_d, s1_d, jint_d, a_d, b_d, v_t = _planes_and_tallies(
            *_device_planes(data),
            mc=float(opts.min_cov),
            chunk=CHUNK,
            n_valid=data.n_sites,
        )
        parts = _blob_from_planes(
            tallies_d, s1_d, jint_d, a_d, b_d, v_t, opts, N, data.n_sites
        )
    P = (N * (N - 1)) // 2
    iu, ju = np.triu_indices(N, 1)
    lib = _load_row_formatter()
    samp_w = _sample_strings(data) if lib is not None else None
    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(_fetch_blob_slice, parts, 0, min(STREAM_PAIRS, P))
        for p0 in range(0, P, STREAM_PAIRS):
            p1 = min(p0 + STREAM_PAIRS, P)
            cur = fut.result()
            if p1 < P:
                fut = ex.submit(
                    _fetch_blob_slice, parts, p1, min(p1 + STREAM_PAIRS, P)
                )
            sl = slice(p0, p1)
            chunk = _finalize_packed(data, opts, cur, iu[sl], ju[sl])
            _emit_pair_chunk(
                data, opts, out, iu[sl], ju[sl], chunk["score"],
                [chunk[k] for k in PAIR_COL_KEYS], lib, samp_w,
            )

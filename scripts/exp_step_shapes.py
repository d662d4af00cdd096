"""Device-bench experiments for the v3 probe step:

  A. dispatch amortization: lax.scan over S resident sub-batches per jit
     call (S=1 is the current per-batch dispatch), S in {1, 2, 4}.
  B. batch size: B=32768 single step.
  C. compaction: top_k vs cumsum+scatter candidate compaction.

All timings mirror bench.py (counts carried, diag drains every 16 logical
batches, final value fetch).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ntsm_tpu.count.kernel_v2 import pack_batch, window_hashes_packed
from ntsm_tpu.count.kernel_v3 import CAND_K, build_table_v3, fingerprint_jnp

rng = np.random.default_rng(7)
k = 19
mask38 = (1 << (2 * k)) - 1
hashes = np.unique(rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64))
tab = build_table_v3(hashes)
n_kmers = int(hashes.shape[0])
nb, bb, slots = tab.n_buckets, tab.bbits, tab.slots
L = 256


def probe_body(h, valid, counts, fp_t, keys_t, vals_t, compaction="topk"):
    bucket = (h & jnp.uint64(nb - 1)).astype(jnp.int32)
    rem = h >> jnp.uint64(bb)
    q = fingerprint_jnp(rem)
    rows = fp_t[bucket]
    cand = (rows == q[..., None]).any(axis=-1) & valid
    flat_cand = cand.reshape(-1)
    n_flat = flat_cand.shape[0]
    kk = min(CAND_K, n_flat)
    if compaction == "topk":
        idx = jax.lax.broadcasted_iota(jnp.int32, (n_flat, 1), 0).reshape(-1)
        tagged = jnp.where(flat_cand, idx, -1)
        top, _ = jax.lax.top_k(tagged, kk)
        live = top >= 0
        cidx = jnp.maximum(top, 0)
    else:  # cumsum compaction
        pos = jnp.cumsum(flat_cand.astype(jnp.int32)) - 1
        idx = jax.lax.broadcasted_iota(jnp.int32, (n_flat, 1), 0).reshape(-1)
        dest = jnp.where(flat_cand & (pos < kk), pos, kk)
        cidx_full = jnp.full((kk + 1,), -1, jnp.int32).at[dest].set(idx)[:kk]
        live = cidx_full >= 0
        cidx = jnp.maximum(cidx_full, 0)
    ch = h.reshape(-1)[cidx]
    cbucket = (ch & jnp.uint64(nb - 1)).astype(jnp.int32)
    erows = keys_t[cbucket]
    ematch = (erows == ch[..., None]) & live[..., None]
    slot = jnp.where(
        ematch, jax.lax.broadcasted_iota(jnp.int32, ematch.shape, 1), slots
    ).min(axis=-1)
    hit = ematch.any(axis=-1)
    vrows = vals_t[cbucket]
    kidx = jnp.take_along_axis(
        vrows, jnp.minimum(slot, slots - 1)[..., None], axis=-1
    ).reshape(-1)
    target = jnp.where(hit, kidx, n_kmers)
    n_cand = cand.sum(dtype=jnp.int64)
    ok = n_cand <= jnp.int64(kk)
    counts = counts.at[target].add((hit & ok).astype(counts.dtype))
    diag = jnp.stack(
        [valid.sum(dtype=jnp.int64), n_cand,
         jnp.where(ok, hit.sum(dtype=jnp.int64), jnp.int64(0))]
    )
    return counts, diag


def make_step(S, B, compaction="topk"):
    @jax.jit
    def step(packed_s, vbits_s, fp_t, keys_t, vals_t, counts):
        if S == 1:
            h, valid = window_hashes_packed(packed_s[0], vbits_s[0], k, L)
            counts, diag = probe_body(h, valid, counts, fp_t, keys_t, vals_t, compaction)
            return counts, diag[None]

        def body(c, xs):
            p, v = xs
            h, valid = window_hashes_packed(p, v, k, L)
            return probe_body(h, valid, c, fp_t, keys_t, vals_t, compaction)

        counts, diags = jax.lax.scan(body, counts, (packed_s, vbits_s))
        return counts, diags

    return step


def bench(label, S, B, compaction="topk", logical_batches=32):
    ps, vs = [], []
    for _ in range(S):
        cn = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
        p, v = pack_batch(cn)
        ps.append(p)
        vs.append(v)
    packed_s = jnp.asarray(np.stack(ps))
    vbits_s = jnp.asarray(np.stack(vs))
    counts = jnp.zeros(n_kmers + 1, dtype=jnp.int32)
    step = make_step(S, B, compaction)
    counts_w, dg = step(packed_s, vbits_s, tab.fp, tab.keys, tab.vals, counts)
    _ = np.asarray(dg)
    _ = int(counts_w[0])

    calls = max(1, logical_batches // S)
    pending = []
    t0 = time.perf_counter()
    for i in range(calls):
        counts, dg = step(packed_s, vbits_s, tab.fp, tab.keys, tab.vals, counts)
        pending.append(dg)
        if len(pending) * S >= 16:
            _ = np.asarray(jnp.concatenate(pending))
            pending.clear()
    if pending:
        _ = np.asarray(jnp.concatenate(pending))
    _ = int(counts[0])
    dt = time.perf_counter() - t0
    rate = calls * S * B * L / dt
    print(f"{label:34s} {rate/1e6:8.1f} Mbase/s  ({dt/calls*1e3:6.1f} ms/call)",
          flush=True)
    return rate


bench("S=1 B=16384 topk (current)", 1, 16384)
bench("S=2 B=16384 topk", 2, 16384)
bench("S=4 B=16384 topk", 4, 16384)
bench("S=1 B=32768 topk", 1, 32768, logical_batches=16)
bench("S=1 B=16384 cumsum", 1, 16384, compaction="cumsum")
bench("S=4 B=16384 cumsum", 4, 16384, compaction="cumsum")

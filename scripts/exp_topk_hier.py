"""VERDICT r1 #3: attack the top_k candidate-compaction stage.

The v3 step's non-gather overhead is dominated by one jax.lax.top_k over
the flat [B*W] tagged-candidate array (k=32768 over 7.8M elements at
B=32768).  Hypothesis: a hierarchical compaction — per-row top_k with a
small k over a [R, C] reshape, then a second top_k over the surviving
R*k1 elements — does less sorting work.  Correctness is preserved by an
overflow flag (any row with more than k1 candidates triggers the same
retry path as a cand_k overflow).

Run: python scripts/exp_topk_hier.py  (single TPU process only)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ntsm_tpu.count.kernel_v2 import pack_batch, window_hashes_packed
from ntsm_tpu.count.kernel_v3 import (
    build_table_v3,
    fingerprint_jnp,
)

rng = np.random.default_rng(7)
k = 19
mask38 = (1 << (2 * k)) - 1
hashes = np.unique(rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64))
tab = build_table_v3(hashes)
nb, bb, slots = tab.n_buckets, tab.bbits, tab.slots
n_kmers = int(hashes.shape[0])

B, L = 32768, 256
W = L - k + 1
CAND_K = 32768

# NSTEP DISTINCT batches scanned over — a single batch re-fed through a
# scan lets XLA hoist the whole loop-invariant probe out of the loop and
# the measurement collapses to scatter cost (observed 5x "speedup")
NSTEP = 8
packs, vbs = [], []
for _ in range(NSTEP):
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    p_, v_ = pack_batch(codes)
    packs.append(p_); vbs.append(v_)
packed = jnp.asarray(np.stack(packs))
vbits = jnp.asarray(np.stack(vbs))


def verify_and_count(h, cidx, live, counts, keys_t, vals_t):
    """Shared tail: exact verify of compacted candidates + scatter."""
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
    counts = counts.at[target].add(hit.astype(counts.dtype))
    return counts, hit.sum(dtype=jnp.int32)


def step_flat(p, v, counts, fp_t, keys_t, vals_t):
    """Current formulation: one top_k over the flat array."""
    h, valid = window_hashes_packed(p, v, k, L)
    bucket = (h & jnp.uint64(nb - 1)).astype(jnp.int32)
    q = fingerprint_jnp(h >> jnp.uint64(bb))
    rows = fp_t[bucket]
    cand = (rows == q[..., None]).any(axis=-1) & valid
    flat = cand.reshape(-1)
    n_flat = flat.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_flat, 1), 0).reshape(-1)
    tagged = jnp.where(flat, idx, -1)
    top, _ = jax.lax.top_k(tagged, CAND_K)
    live = top >= 0
    cidx = jnp.maximum(top, 0)
    counts, nh = verify_and_count(h, cidx, live, counts, keys_t, vals_t)
    return counts, jnp.stack([valid.sum(dtype=jnp.int32), cand.sum(dtype=jnp.int32), nh])


def make_step_hier(C: int, k1: int):
    def step(p, v, counts, fp_t, keys_t, vals_t):
        h, valid = window_hashes_packed(p, v, k, L)
        bucket = (h & jnp.uint64(nb - 1)).astype(jnp.int32)
        q = fingerprint_jnp(h >> jnp.uint64(bb))
        rows = fp_t[bucket]
        cand = (rows == q[..., None]).any(axis=-1) & valid
        flat = cand.reshape(-1)
        n_flat = flat.shape[0]
        R = n_flat // C
        cand2 = flat.reshape(R, C)
        idx2 = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        base = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) * C
        tagged = jnp.where(cand2, base + idx2, -1)
        t1, _ = jax.lax.top_k(tagged, k1)  # [R, k1]
        # overflow if any row had > k1 candidates
        row_cand = cand2.sum(axis=1, dtype=jnp.int32)
        over = (row_cand > k1).any()
        t1f = t1.reshape(-1)
        top, _ = jax.lax.top_k(t1f, CAND_K)
        live = top >= 0
        cidx = jnp.maximum(top, 0)
        counts, nh = verify_and_count(h, cidx, live, counts, keys_t, vals_t)
        n_cand = cand.sum(dtype=jnp.int32)
        # report overflow through the n_cand channel (engine semantics)
        n_cand = jnp.where(over, jnp.int32(CAND_K + 1), n_cand)
        return counts, jnp.stack([valid.sum(dtype=jnp.int32), n_cand, nh])

    return step


def timed(label, step):
    @jax.jit
    def run(ps, vs, c, fp_t, keys_t, vals_t):
        def body(c, xs):
            p, v = xs
            c, d = step(p, v, c, fp_t, keys_t, vals_t)
            return c, d
        c, ds = jax.lax.scan(body, c, (ps, vs))
        return c, ds

    c0 = jnp.zeros(n_kmers + 1, dtype=jnp.int32)
    c, ds = run(packed, vbits, c0, tab.fp, tab.keys, tab.vals)
    d_np = np.asarray(ds)
    _ = int(c[0])
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        c, ds = run(packed, vbits, c0, tab.fp, tab.keys, tab.vals)
        _ = int(c[0])
    per = (time.perf_counter() - t0) / reps / NSTEP
    print(
        f"{label:34s}: {per*1e3:7.2f} ms/step  {B*L/1e6/per:6.1f} Mbase/s  "
        f"diag={d_np[0]}"
    )
    return np.asarray(c)


base = timed("flat top_k (current)", step_flat)
for C, k1 in [(256, 32), (512, 32), (1024, 64), (2048, 64), (4096, 64),
              (4096, 128), (256, 16), (4096, 32)]:
    got = timed(f"hier C={C} k1={k1}", make_step_hier(C, k1))
    print("   counts match:", np.array_equal(base, got))

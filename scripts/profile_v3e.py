"""v3 sub-stage costs + CAND_K tuning."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from ntsm_tpu.count.kernel_v2 import pack_batch, window_hashes_packed
from ntsm_tpu.count.kernel_v3 import build_table_v3, fingerprint_jnp

rng = np.random.default_rng(7)
k = 19
mask38 = (1 << (2 * k)) - 1
hashes = np.unique(rng.integers(0, mask38, size=2503450, dtype=np.uint64))
tab = build_table_v3(hashes)
n_kmers = hashes.shape[0]
nb, slots, bbits = tab.n_buckets, tab.slots, tab.bbits

B, L = 16384, 256
NSTEP = 8
packs, vbs = [], []
for i in range(NSTEP):
    cn = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    p, v = pack_batch(cn)
    packs.append(p); vbs.append(v)
packed_s = jnp.asarray(np.stack(packs)); vbits_s = jnp.asarray(np.stack(vbs))

@jax.jit
def triv(x): return x + 1
r = triv(jnp.int32(0)); _ = int(r)
t0 = time.perf_counter()
for i in range(20):
    r = triv(r); _ = int(r)
rtt = (time.perf_counter() - t0) / 20
print(f"(RTT {rtt*1e3:.1f} ms)")

def timed(label, stepfn, counts0=None):
    use_counts = counts0 is not None
    @jax.jit
    def run(packed_s, vbits_s, fp, keys, vals, counts0):
        def body(carry, xs):
            c, acc = carry
            p, v = xs
            c, val = stepfn(p, v, fp, keys, vals, c)
            return (c, acc + val), None
        (c, acc), _ = jax.lax.scan(body, (counts0, jnp.int64(0)), (packed_s, vbits_s))
        return c, acc
    c0 = counts0 if use_counts else jnp.int64(0)
    out = run(packed_s, vbits_s, tab.fp, tab.keys, tab.vals, c0)
    _ = int(out[1])
    t0 = time.perf_counter()
    REP = 3
    for _ in range(REP):
        out = run(packed_s, vbits_s, tab.fp, tab.keys, tab.vals, c0)
        _ = int(out[1])
    dt = (time.perf_counter() - t0) / REP
    per = (dt - rtt) / NSTEP
    print(f"{label:42s}: {per*1e3:7.2f} ms  {B*L/1e3/(per*1e3):8.1f} Mbase/s")

def filt(p, v, fp, keys, vals):
    h, valid = window_hashes_packed(p, v, k, L)
    bucket = (h & jnp.uint64(nb - 1)).astype(jnp.int32)
    q = fingerprint_jnp(h >> jnp.uint64(bbits))
    rows = fp[bucket]
    cand = (rows == q[..., None]).any(-1) & valid
    return h, cand

def s_filter(p, v, fp, keys, vals, c):
    h, cand = filt(p, v, fp, keys, vals)
    return c, cand.sum(dtype=jnp.int64)

def make_topk(kk):
    def s(p, v, fp, keys, vals, c):
        h, cand = filt(p, v, fp, keys, vals)
        fc = cand.reshape(-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, (fc.shape[0], 1), 0).reshape(-1)
        top, _ = jax.lax.top_k(jnp.where(fc, idx, -1), kk)
        return c, top.sum(dtype=jnp.int64)
    return s

def make_verify(kk):
    def s(p, v, fp, keys, vals, c):
        h, cand = filt(p, v, fp, keys, vals)
        fc = cand.reshape(-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, (fc.shape[0], 1), 0).reshape(-1)
        top, _ = jax.lax.top_k(jnp.where(fc, idx, -1), kk)
        live = top >= 0
        ch = h.reshape(-1)[jnp.maximum(top, 0)]
        cb = (ch & jnp.uint64(nb - 1)).astype(jnp.int32)
        er = keys[cb]
        em = (er == ch[..., None]) & live[..., None]
        slot = jnp.where(em, jax.lax.broadcasted_iota(jnp.int32, em.shape, 1), slots).min(-1)
        hit = em.any(-1)
        vr = vals[cb]
        kidx = jnp.take_along_axis(vr, jnp.minimum(slot, slots-1)[..., None], -1).reshape(-1)
        return c, jnp.where(hit, kidx, 0).sum(dtype=jnp.int64)
    return s

def make_full(kk):
    def s(p, v, fp, keys, vals, counts):
        h, cand = filt(p, v, fp, keys, vals)
        fc = cand.reshape(-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, (fc.shape[0], 1), 0).reshape(-1)
        top, _ = jax.lax.top_k(jnp.where(fc, idx, -1), kk)
        live = top >= 0
        ch = h.reshape(-1)[jnp.maximum(top, 0)]
        cb = (ch & jnp.uint64(nb - 1)).astype(jnp.int32)
        er = keys[cb]
        em = (er == ch[..., None]) & live[..., None]
        slot = jnp.where(em, jax.lax.broadcasted_iota(jnp.int32, em.shape, 1), slots).min(-1)
        hit = em.any(-1)
        vr = vals[cb]
        kidx = jnp.take_along_axis(vr, jnp.minimum(slot, slots-1)[..., None], -1).reshape(-1)
        target = jnp.where(hit, kidx, n_kmers)
        counts = counts.at[target].add(hit.astype(jnp.int32))
        return counts, hit.sum(dtype=jnp.int64)
    return s

counts0 = jnp.zeros(n_kmers + 1, dtype=jnp.int32)
timed("filter only", s_filter)
timed("filter + topk 64K", make_topk(65536))
timed("filter + topk 32K", make_topk(32768))
timed("filter + topk 64K + verify", make_verify(65536))
timed("filter + topk 32K + verify", make_verify(32768))
timed("FULL kk=64K", make_full(65536), counts0)
timed("FULL kk=32K", make_full(32768), counts0)
timed("FULL kk=16K", make_full(16384), counts0)

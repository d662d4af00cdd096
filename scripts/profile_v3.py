"""Measure (a) tunnel RTT, (b) true per-step compute via device-side scan chain,
(c) cost of on-device scatter-add of top_k hits."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import functools

sys.path.insert(0, ".")
from ntsm_tpu.count.kernel_v2 import SLOTS_V2, pack_batch, window_hashes_packed, TOPK
from ntsm_tpu.io.sites import build_lookup

rng = np.random.default_rng(7)
k = 19
mask38 = (1 << (2 * k)) - 1
hashes = np.unique(rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64))
lookup = build_lookup(hashes, slots=SLOTS_V2)
keys = jnp.asarray(lookup.keys)
n_buckets, slots = lookup.keys.shape
sbits = (slots - 1).bit_length()

B, L = 16384, 256
NSTEP = 12

packs, vbs = [], []
for i in range(NSTEP):
    codes_np = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    p, v = pack_batch(codes_np)
    packs.append(p); vbs.append(v)
packed_s = jnp.asarray(np.stack(packs))
vbits_s = jnp.asarray(np.stack(vbs))

# --- RTT ---
@jax.jit
def triv(x):
    return x + 1
r = triv(jnp.int32(0)); _ = int(r)
t0 = time.perf_counter()
N = 20
for i in range(N):
    r = triv(r); _ = int(r)
rtt = (time.perf_counter() - t0) / N
print(f"tunnel RTT (dispatch+scalar fetch): {rtt*1e3:.2f} ms")

def step_body(counts, packed, vbits, with_scatter, with_topk=True):
    h, valid = window_hashes_packed(packed, vbits, k, L)
    bucket = (h & jnp.uint64(n_buckets - 1)).astype(jnp.int32)
    rows = keys[bucket]
    match = rows == h[..., None]
    slot = jnp.where(match, jax.lax.broadcasted_iota(jnp.int32, match.shape, 2), slots).min(axis=-1)
    found = match.any(axis=-1) & valid
    packed_hit = jnp.where(found, (bucket << sbits) | slot, -1) + 1
    flat = packed_hit.reshape(-1)
    if with_topk:
        top, _ = jax.lax.top_k(flat, TOPK)
        if with_scatter:
            idx = jnp.maximum(top - 1, 0)
            upd = (top > 0).astype(jnp.int32)
            counts = counts.at[idx].add(upd)
    return counts, found.sum(dtype=jnp.int64), valid.sum(dtype=jnp.int64)

def make_scan(with_scatter, with_topk=True):
    @jax.jit
    def run(packed_s, vbits_s, counts0):
        def body(carry, xs):
            counts, tf, tv = carry
            p, v = xs
            counts, nf, nv = step_body(counts, p, v, with_scatter, with_topk)
            return (counts, tf + nf, tv + nv), None
        (counts, tf, tv), _ = jax.lax.scan(body, (counts0, jnp.int64(0), jnp.int64(0)), (packed_s, vbits_s))
        return counts, tf, tv
    return run

counts0 = jnp.zeros(n_buckets * slots, dtype=jnp.int32)

for name, ws, wt in [("hash+gather+match+topk", False, True),
                     ("  + device scatter-add", True, True),
                     ("hash+gather+match only", False, False)]:
    run = make_scan(ws, wt)
    out = run(packed_s, vbits_s, counts0)
    _ = int(out[1])
    t0 = time.perf_counter()
    REP = 4
    for _ in range(REP):
        out = run(packed_s, vbits_s, counts0)
        _ = int(out[1])
    dt = (time.perf_counter() - t0) / REP
    per_step = (dt - rtt) / NSTEP
    print(f"{name}: {per_step*1e3:7.2f} ms/step -> {B*L/1e3/(per_step*1e3):8.1f} Mbase/s")

"""In-scan stage isolation: hash only vs gather/match table variants."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from ntsm_tpu.count.kernel_v2 import SLOTS_V2, pack_batch, window_hashes_packed
from ntsm_tpu.io.sites import build_lookup, EMPTY_KEY

rng = np.random.default_rng(7)
k = 19
mask38 = (1 << (2 * k)) - 1
hashes = np.unique(rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64))

B, L = 16384, 256
NSTEP = 8
packs, vbs = [], []
for i in range(NSTEP):
    codes_np = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    p, v = pack_batch(codes_np)
    packs.append(p); vbs.append(v)
packed_s = jnp.asarray(np.stack(packs))
vbits_s = jnp.asarray(np.stack(vbs))

@jax.jit
def triv(x): return x + 1
r = triv(jnp.int32(0)); _ = int(r)
t0 = time.perf_counter()
for i in range(20):
    r = triv(r); _ = int(r)
rtt = (time.perf_counter() - t0) / 20
print(f"(RTT {rtt*1e3:.1f} ms)")

def timed(make_body, label, *tables):
    @jax.jit
    def run(packed_s, vbits_s, *tables):
        def body(carry, xs):
            p, v = xs
            return carry + make_body(p, v, *tables), None
        tot, _ = jax.lax.scan(body, jnp.int64(0), (packed_s, vbits_s))
        return tot
    out = run(packed_s, vbits_s, *tables); _ = int(out)
    t0 = time.perf_counter()
    REP = 3
    for _ in range(REP):
        out = run(packed_s, vbits_s, *tables); _ = int(out)
    dt = (time.perf_counter() - t0) / REP
    per = (dt - rtt) / NSTEP
    print(f"{label:36s}: {per*1e3:7.2f} ms/step  {B*L/1e3/(per*1e3):8.1f} Mbase/s")

def hash_only(p, v):
    h, valid = window_hashes_packed(p, v, k, L)
    return (h & jnp.uint64(1)).sum(dtype=jnp.int64) + valid.sum(dtype=jnp.int64)

def make_gather64(nb):
    def f(p, v, keys):
        h, valid = window_hashes_packed(p, v, k, L)
        bucket = (h & jnp.uint64(nb - 1)).astype(jnp.int32)
        rows = keys[bucket]
        match = rows == h[..., None]
        return (match.any(-1) & valid).sum(dtype=jnp.int64)
    return f

def make_gather32(nb, bbits):
    def f(p, v, keys32):
        h, valid = window_hashes_packed(p, v, k, L)
        bucket = (h & jnp.uint64(nb - 1)).astype(jnp.int32)
        remq = (h >> jnp.uint64(bbits)).astype(jnp.uint32) + 1
        rows = keys32[bucket]
        match = rows == remq[..., None]
        return (match.any(-1) & valid).sum(dtype=jnp.int64)
    return f

def u32_table(lk):
    bb = int(np.log2(lk.n_buckets))
    rem = ((lk.keys >> np.uint64(bb)) + 1).astype(np.uint32)
    return jnp.asarray(np.where(lk.keys == EMPTY_KEY, np.uint32(0), rem)), bb

timed(hash_only, "hash only")

lk16 = build_lookup(hashes, slots=16)
timed(make_gather64(lk16.n_buckets), f"u64 x16 slots ({lk16.n_buckets} bkt,128B)", jnp.asarray(lk16.keys))
k32, bb = u32_table(lk16)
timed(make_gather32(lk16.n_buckets, bb), f"u32 x16 slots ({lk16.n_buckets} bkt, 64B)", k32)

lk8 = build_lookup(hashes, slots=8)
k32b, bb8 = u32_table(lk8)
timed(make_gather32(lk8.n_buckets, bb8), f"u32 x8 slots ({lk8.n_buckets} bkt, 32B)", k32b)

lk4 = build_lookup(hashes, slots=4)
k32c, bb4 = u32_table(lk4)
timed(make_gather32(lk4.n_buckets, bb4), f"u32 x4 slots ({lk4.n_buckets} bkt, 16B)", k32c)

"""v3 step: correctness vs brute force + chained timing."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from ntsm_tpu.count.kernel_v2 import pack_batch, window_hashes_packed
from ntsm_tpu.count.kernel_v3 import build_table_v3, count_step_v3
from ntsm_tpu.core.hash import hash64_np, kmer_mask

rng = np.random.default_rng(7)
k = 19
mask38 = (1 << (2 * k)) - 1

B, L = 16384, 256
codes_np = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
# sprinkle some Ns
codes_np[rng.random((B, L)) < 0.001] = 4

# build a site set that contains ~0.3% of this batch's windows (planted hits)
def window_hashes_host(codes):
    Bc, Lc = codes.shape
    W = Lc - k + 1
    c = codes.astype(np.uint64)
    comp = np.uint64(3) ^ c
    fw = np.zeros((Bc, W), dtype=np.uint64)
    rv = np.zeros((Bc, W), dtype=np.uint64)
    for j in range(k):
        fw = ((fw << np.uint64(2)) | (c[:, j:j+W] & np.uint64(3))) & np.uint64(mask38)
        rv = rv | ((comp[:, j:j+W] & np.uint64(3)) << np.uint64(2*j))
    h = hash64_np(np.minimum(fw, rv), kmer_mask(k))
    bad = (codes >= 4).astype(np.int32)
    cs = np.concatenate([np.zeros((Bc,1), np.int32), np.cumsum(bad, 1)], 1)
    valid = (cs[:, k:] - cs[:, :-k]) == 0
    return h, valid

h_all, valid_all = window_hashes_host(codes_np)
flat = h_all[valid_all]
planted = rng.choice(flat, size=12000, replace=False)
rand_keys = rng.integers(0, mask38, size=2503450 - 12000, dtype=np.uint64)
hashes = np.unique(np.concatenate([planted, rand_keys]))
print("n keys:", hashes.shape[0])

tab = build_table_v3(hashes)
print("buckets:", tab.n_buckets, "fp MB:", tab.fp.nbytes/1e6)

n_kmers = hashes.shape[0]
# golden expected counts
sorted_h = np.sort(hashes)
pos = np.searchsorted(sorted_h, flat)
pos = np.clip(pos, 0, n_kmers - 1)
is_hit = sorted_h[pos] == flat
exp_hits = int(is_hit.sum())
exp_counts = np.zeros(n_kmers + 1, dtype=np.int64)
np.add.at(exp_counts, pos[is_hit], 1)
print("expected hits:", exp_hits)

packed_np, vbits_np = pack_batch(codes_np)
packed = jnp.asarray(packed_np); vbits = jnp.asarray(vbits_np)
counts = jnp.zeros(n_kmers + 1, dtype=jnp.int32)

kw = dict(k=k, L=L, n_buckets=tab.n_buckets, slots=tab.slots, bbits=tab.bbits)
counts2, diag = count_step_v3(packed, vbits, tab.fp, tab.keys, tab.vals, counts, **kw)
diag = np.asarray(diag)
print("diag [valid, cand, hits]:", diag)

# map golden counts into table's kmer index order
order = np.argsort(hashes, kind="stable")
# hashes is already unique-sorted by np.unique; table vals index == position in `hashes`
got = np.asarray(counts2)[:n_kmers]
exp = exp_counts[:n_kmers]
print("counts match:", np.array_equal(got, exp), "| got hits:", got.sum(), "exp:", exp.sum())
assert diag[2] == exp_hits

# --- timing (chained scan, RTT-subtracted) ---
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

from functools import partial
step = partial(count_step_v3, **kw)

@jax.jit
def run(packed_s, vbits_s, counts0, fp, keys, vals):
    def body(carry, xs):
        counts, dsum = carry
        p, v = xs
        counts, diag = count_step_v3(p, v, fp, keys, vals, counts, **kw)
        return (counts, dsum + diag), None
    (counts, dsum), _ = jax.lax.scan(body, (counts0, jnp.zeros(3, jnp.int64)), (packed_s, vbits_s))
    return counts, dsum

out = run(packed_s, vbits_s, counts, tab.fp, tab.keys, tab.vals)
_ = int(out[1][0])
t0 = time.perf_counter()
REP = 4
for _ in range(REP):
    out = run(packed_s, vbits_s, counts, tab.fp, tab.keys, tab.vals)
    _ = int(out[1][0])
dt = (time.perf_counter() - t0) / REP
per = (dt - rtt) / NSTEP
print(f"v3 step: {per*1e3:.2f} ms -> {B*L/1e3/(per*1e3):.1f} Mbase/s")

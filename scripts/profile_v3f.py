"""Where does the per-call v3 loop lose time vs the scan chain?"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from ntsm_tpu.count.kernel_v3 import build_table_v3, count_step_v3, pack_batch

rng = np.random.default_rng(7)
k = 19
mask38 = (1 << (2 * k)) - 1
hashes = np.unique(rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64))
tab = build_table_v3(hashes)
n_kmers = int(hashes.shape[0])
kw = dict(k=k, L=256, n_buckets=tab.n_buckets, slots=tab.slots, bbits=tab.bbits)

B, L = 16384, 256
codes_np = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
packed_np, vbits_np = pack_batch(codes_np)
packed = jnp.asarray(packed_np)
vbits = jnp.asarray(vbits_np)
counts0 = jnp.zeros(n_kmers + 1, dtype=jnp.int32)

counts, diag = count_step_v3(packed, vbits, tab.fp, tab.keys, tab.vals, counts0, **kw)
_ = np.asarray(diag)

# 1) dispatch-only timing: how long does the Python call itself block?
counts = counts0
t0 = time.perf_counter()
marks = []
for i in range(12):
    counts, diag = count_step_v3(packed, vbits, tab.fp, tab.keys, tab.vals, counts, **kw)
    marks.append(time.perf_counter() - t0)
t_disp = time.perf_counter() - t0
_ = np.asarray(diag)
t_all = time.perf_counter() - t0
print("per-call dispatch times:", " ".join(f"{m*1e3:.0f}" for m in marks))
print(f"12 dispatches: {t_disp*1e3:.0f} ms; + final diag fetch: {t_all*1e3:.0f} ms")
print(f"-> per-iter {t_all/12*1e3:.1f} ms")

# 2) with donation of counts
step_don = jax.jit(
    count_step_v3.__wrapped__,
    static_argnames=("k", "L", "n_buckets", "slots", "bbits", "cand_k"),
    donate_argnums=(5,),
)
counts = jnp.zeros(n_kmers + 1, dtype=jnp.int32)
counts, diag = step_don(packed, vbits, tab.fp, tab.keys, tab.vals, counts, **kw)
_ = np.asarray(diag)
t0 = time.perf_counter()
for i in range(12):
    counts, diag = step_don(packed, vbits, tab.fp, tab.keys, tab.vals, counts, **kw)
_ = np.asarray(diag)
t_all = time.perf_counter() - t0
print(f"donated: per-iter {t_all/12*1e3:.1f} ms")

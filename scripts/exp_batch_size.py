"""Batch-size sweep for the v3 step: does a bigger batch amortize the
~13 ms fixed dispatch cost?  NO — cand_k must scale with the batch (the
expected candidate count does), and the top_k growth eats the gain, plus
the larger working set degrades the gather:

    B= 32768 cand_k= 32768    48.2 ms/step   173.9 Mbase/s   <- default
    B= 65536 cand_k= 65536   120.4 ms/step   139.3 Mbase/s
    B=131072 cand_k=131072   249.3 ms/step   134.6 Mbase/s

(TPU v5e, 2026-08-17, chained steps over distinct batches, stacked-diag
+ value fetch.)  B=32768 stays the sweet spot.
"""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ntsm_tpu.count.kernel_v3 import build_table_v3, count_step_v3, pack_batch

rng = np.random.default_rng(7)
mask38 = (1 << 38) - 1
hashes = np.unique(rng.integers(0, mask38, size=96287*26, dtype=np.uint64))
tab = build_table_v3(hashes)
n = hashes.shape[0]
L = 256

def run(B, cand_k, nstep, reps=3):
    kw = dict(k=19, L=L, n_buckets=tab.n_buckets, slots=tab.slots, bbits=tab.bbits,
              cand_k=cand_k)
    packs, vbs = [], []
    for _ in range(nstep):
        codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
        p, v = pack_batch(codes)
        packs.append(jnp.asarray(p)); vbs.append(jnp.asarray(v))
    jax.block_until_ready((packs, vbs))
    counts = jnp.zeros(n + 1, dtype=jnp.int32)
    pend = []
    c, d = count_step_v3(packs[0], vbs[0], tab.fp, tab.keys, tab.vals, counts, **kw)
    _ = np.asarray(d)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        cc = counts
        for i in range(nstep):
            cc, diag = count_step_v3(packs[i], vbs[i], tab.fp, tab.keys, tab.vals, cc, **kw)
            pend.append(diag)
        _ = np.asarray(jnp.stack(pend)); pend.clear()
        _ = int(cc[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    mb = nstep * B * L / 1e6
    print(f"B={B:6d} cand_k={cand_k}: {best/nstep*1e3:6.1f} ms/step  {mb/best:6.1f} Mbase/s")

run(32768, 32768, 16)
run(65536, 65536, 8)
run(131072, 131072, 4)

"""Itemize the last 22% of device counting (VERDICT r2 #5).

bench.py measures 179.5 Mbase/s at B=32768 (46.7 ms/step) vs the 227
Mbase/s "pure-gather roofline" (37 ms gather alone).  The stage budget
(BASELINE.md) sums to ~47 ms — suggesting the residual is the sequential
VPU stages (compaction 5 + verify 1.5 + scatter 3 + hash 0.7), NOT
dispatch.  This script settles it by measuring, in one process:

  stage_sum    per-stage times via incremental jits, scalar-forced, warm
               (hash | +gather | +compact | +verify+scatter = full step)
  step_sync    full count_step_v3, scalar-forced every step (includes one
               tunnel RTT per step; RTT measured separately and subtracted)
  step_amort   the production cadence: chained carry, drain every 16
  rtt          empty-fetch round-trip on a [3] vector

dispatch gap = step_amort − stage_sum.  If ~0, the BASELINE table gets an
irreducibility row; if material, the gap is host dispatch/serialization
and worth attacking.

Usage: python scripts/exp_dispatch_trace.py [iters=32]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import jax
    import jax.numpy as jnp

    from ntsm_tpu.count.kernel_v3 import TableV3, count_step_v3, pack_batch

    rng = np.random.default_rng(7)
    k, n_sites = 19, 96287
    mask38 = (1 << (2 * k)) - 1
    hashes = np.unique(
        rng.integers(0, mask38, size=n_sites * 26, dtype=np.uint64)
    )
    tab = TableV3.from_hashes_device(hashes)
    n_kmers = int(hashes.shape[0])
    kw = dict(
        k=k, L=256, n_buckets=tab.n_buckets, slots=tab.slots, bbits=tab.bbits
    )

    B, L = 32768, 256
    codes_np = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    packed_np, vbits_np = pack_batch(codes_np)
    packed = jnp.asarray(packed_np)
    vbits = jnp.asarray(vbits_np)
    counts0 = jnp.zeros(n_kmers + 1, dtype=jnp.int32)

    def timed(fn, *args, reps=8, **kws):
        out = fn(*args, **kws)  # cold
        s = sum(
            float(jnp.sum(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(out)
        )
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kws)
            s += sum(
                float(jnp.sum(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(out)
            )
        return (time.perf_counter() - t0) / reps, s

    # RTT: fetch a tiny device array already resident
    tiny = jnp.zeros(3, jnp.int32) + 1
    float(jnp.sum(tiny))
    t0 = time.perf_counter()
    for _ in range(16):
        np.asarray(tiny)
    rtt = (time.perf_counter() - t0) / 16
    print(f"rtt          : {rtt*1e3:8.2f} ms")

    # full step, scalar-forced per step
    t_sync, _ = timed(
        lambda: count_step_v3(
            packed, vbits, tab.fp, tab.keys, tab.vals, counts0, **kw
        )
    )
    print(f"step_sync    : {t_sync*1e3:8.2f} ms (incl ~1 rtt)")

    # production cadence (bench.py loop): chained carry, drain every 16
    counts = counts0
    counts, diag = count_step_v3(
        packed, vbits, tab.fp, tab.keys, tab.vals, counts, **kw
    )
    _ = np.asarray(jnp.stack([diag] * 16))
    _ = int(counts[0])
    submit = []
    pending = []
    t0 = time.perf_counter()
    for i in range(iters):
        ts = time.perf_counter()
        counts, diag = count_step_v3(
            packed, vbits, tab.fp, tab.keys, tab.vals, counts, **kw
        )
        submit.append(time.perf_counter() - ts)
        pending.append(diag)
        if len(pending) >= 16:
            _ = np.asarray(jnp.stack(pending))
            pending.clear()
    if pending:
        _ = np.asarray(jnp.stack(pending))
    _ = int(counts[0])
    wall = time.perf_counter() - t0
    t_amort = wall / iters
    print(
        f"step_amort   : {t_amort*1e3:8.2f} ms "
        f"({B*L/ t_amort/1e6:.1f} Mbase/s; host submit "
        f"{np.mean(submit)*1e3:.2f} ms/step)"
    )

    # stage budget reference: profile_v3g / exp_topk_hier recorded
    # hash ~0.7 + fp gather ~37 + compact ~5 + verify ~1.5 + scatter ~3
    # ≈ 47 ms.  dispatch gap = step_amort − that sum.
    print(
        f"gap vs 47 ms stage sum: {(t_amort - 0.047)*1e3:+8.2f} ms; "
        f"gap vs sync-step: {(t_amort - (t_sync - rtt))*1e3:+8.2f} ms"
    )


if __name__ == "__main__":
    main()

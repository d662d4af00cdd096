"""Measure whether host->device upload overlaps device compute on this
platform (axon tunnel), and which overlap mechanism wins.

Modes timed over the same synthetic workload (16384x256 batches against a
human-scale v3 table):
  upload   - transfers only (block per batch)
  compute  - chained count_step_v3 on one resident batch
  serial   - the current engine loop: asarray then step, per batch
  thread   - a transfer thread keeps one batch in flight ahead of compute
  deep     - transfer thread with a deeper prefetch queue (4)

All timings chain the counts carry and fetch a scalar at the end (the
tunnel under-reports with block_until_ready alone).
"""

import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    B, L = 16384, 256
    rng = np.random.default_rng(7)

    from ntsm_tpu.count.kernel_v2 import pack_batch_fast
    from ntsm_tpu.count.kernel_v3 import (
        build_table_v3,
        count_step_v3,
        fuse_packed,
        split_fused,
    )

    mask38 = (1 << 38) - 1
    hashes = np.unique(rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64))
    tab = build_table_v3(hashes)
    n_kmers = hashes.shape[0]
    kw = dict(k=19, L=L, n_buckets=tab.n_buckets, slots=tab.slots, bbits=tab.bbits)

    # host batches: random codes 0..3 (all valid) -> packed+fused
    fused_host = []
    for _ in range(n_batches):
        codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
        p, v = pack_batch_fast(codes)
        fused_host.append(fuse_packed(p, v))
    bytes_per = fused_host[0].nbytes
    mbase_per = B * L / 1e6
    print(f"# {n_batches} batches x {bytes_per/1e6:.2f} MB ({mbase_per:.2f} Mbase)")

    counts0 = jnp.zeros(n_kmers + 1, dtype=jnp.int32)

    def step(fused_dev, counts):
        pk, vb = split_fused(fused_dev, L)
        return count_step_v3(pk, vb, tab.fp, tab.keys, tab.vals, counts, **kw)

    # warm compile + one run
    f0 = jnp.asarray(fused_host[0])
    c, d = step(f0, counts0)
    jax.block_until_ready((c, d))

    def report(name, dt):
        print(f"{name:8s} {dt:7.3f} s  {n_batches*mbase_per/dt:7.1f} Mbase/s  "
              f"{dt/n_batches*1e3:6.1f} ms/batch")

    # --- upload only ---
    t0 = time.perf_counter()
    devs = []
    for fh in fused_host:
        devs.append(jnp.asarray(fh))
    jax.block_until_ready(devs)
    report("upload", time.perf_counter() - t0)
    del devs

    # does asarray return before the transfer completes?
    t0 = time.perf_counter()
    a = jnp.asarray(fused_host[0])
    t_issue = time.perf_counter() - t0
    jax.block_until_ready(a)
    t_done = time.perf_counter() - t0
    print(f"# single asarray: issue {t_issue*1e3:.1f} ms, ready {t_done*1e3:.1f} ms")
    del a

    # --- compute only (data resident) ---
    counts = counts0
    t0 = time.perf_counter()
    for _ in range(n_batches):
        counts, diag = step(f0, counts)
    _ = int(np.asarray(diag)[0])
    report("compute", time.perf_counter() - t0)

    # --- serial (current engine) ---
    counts = counts0
    diags = []
    t0 = time.perf_counter()
    for fh in fused_host:
        counts, diag = step(jnp.asarray(fh), counts)
        diags.append(diag)
    _ = np.asarray(jnp.stack(diags))
    report("serial", time.perf_counter() - t0)

    # --- transfer thread, one in flight ---
    for depth, name in ((1, "thread"), (4, "deep")):
        q: queue.Queue = queue.Queue(maxsize=depth)

        def producer():
            for fh in fused_host:
                q.put(jnp.asarray(fh))
            q.put(None)

        counts = counts0
        diags = []
        t0 = time.perf_counter()
        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            fd = q.get()
            if fd is None:
                break
            counts, diag = step(fd, counts)
            diags.append(diag)
        _ = np.asarray(jnp.stack(diags))
        th.join()
        report(name, time.perf_counter() - t0)


if __name__ == "__main__":
    main()

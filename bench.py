"""Headline benchmark: k-mer counting throughput on one TPU chip.

Measures the v3 device counting pipeline (packed 2-bit upload format,
window hashing, fingerprint-filtered site-table probe, exact verification,
on-device count accumulation) on a human-scale synthetic workload: a
96287-site / ~2.5M-k-mer fingerprint table (the shape of
data/human_sites_n10.fa) and 256b read segments — exactly the hot path of
`ntsm count` (reference: src/FingerPrint.hpp:89-103).

Prints ONE JSON line:
  {"metric": "count_bases_per_s", "value": ..., "unit": "base/s",
   "vs_baseline": ...}

vs_baseline compares against the reference C++ ntsmCount measured on this
host (single thread, same site-table scale, 100 Mbp synthetic FASTQ):
11.65 Mbase/s (8.58 s wall for 1M x 100bp reads, ntsm v1.2.1, g++ -O2).
The reference parallelizes only across input FILES (one thread per file,
FingerPrint.hpp:47), so per-core throughput is its unit of scaling.

Timing methodology (the axon tunnel's RTT is ~33 ms and block_until_ready
under-reports): the loop mirrors the production engine — counts carried on
device batch to batch, per-batch [3]-vector diagnostics drained with one
stacked fetch every DRAIN batches, and a final value fetch.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_BASES_PER_S = 11.65e6  # ntsmCount v1.2.1, 1 thread, this host (see above)


def main() -> None:
    # The tunneled TPU backend can become unreachable (observed multi-hour
    # outages); a silent hang here would leave the round with no benchmark
    # record at all.  A watchdog THREAD (not SIGALRM: the hang is inside a
    # C PJRT call, where Python signal handlers never run) turns that into
    # an explicit failure line.
    import os
    import threading

    def _give_up():
        print(
            json.dumps(
                {
                    "metric": "count_bases_per_s",
                    "value": 0,
                    "unit": "base/s",
                    "vs_baseline": 0,
                    "error": "timeout: device backend unreachable",
                }
            ),
            flush=True,
        )
        os._exit(2)

    _timeout_s = float(os.environ.get("NTSM_BENCH_TIMEOUT_S", "1800"))
    _watchdog = None
    if _timeout_s > 0:  # 0 disables the watchdog (matches the old alarm(0))
        _watchdog = threading.Timer(_timeout_s, _give_up)
        _watchdog.daemon = True
        _watchdog.start()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from ntsm_tpu.count.kernel_v3 import (
        TableV3,
        count_step_v3,
        pack_batch,
    )

    rng = np.random.default_rng(7)
    k = 19
    n_sites = 96287
    kmers_per_site = 26  # 13 per allele
    mask38 = (1 << (2 * k)) - 1
    hashes = np.unique(
        rng.integers(0, mask38, size=n_sites * kmers_per_site, dtype=np.uint64)
    )
    tab = TableV3.from_hashes_device(hashes)  # 20 MB upload, planes on device
    n_kmers = int(hashes.shape[0])
    kw = dict(
        k=k, L=256, n_buckets=tab.n_buckets, slots=tab.slots, bbits=tab.bbits
    )

    B, L = 32768, 256  # ~4.2 Mbase per step (150-300bp reads segment to 256)
    AGG = 4  # the engine executes one scan-of-AGG per aggregated upload
    # (count/engine.py group_exec; exp_scan_s.py: 47.6 -> 46.1 ms/batch)
    codes_np = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    packed_np, vbits_np = pack_batch(codes_np)
    fused = jnp.asarray(
        np.stack(
            [np.concatenate([packed_np, vbits_np], axis=1)] * AGG
        )
    )
    counts = jnp.zeros(n_kmers + 1, dtype=jnp.int32)

    import functools

    @functools.partial(jax.jit, donate_argnums=(4,))
    def scan_group(fused_g, fp_t, keys_t, vals_t, counts_in):
        def body(c, f):
            pk = f[:, : L // 4]
            vb = f[:, L // 4 :]
            c, d = count_step_v3(pk, vb, fp_t, keys_t, vals_t, c, **kw)
            return c, d

        return jax.lax.scan(body, counts_in, fused_g)

    # compile + warmup (including the drain/fetch programs)
    counts, diags = scan_group(fused, tab.fp, tab.keys, tab.vals, counts)
    _ = np.asarray(jnp.concatenate([diags] * 4))
    _ = int(counts[0])

    iters, drain = 32, 16  # batches; drained one RTT per `drain` batches
    pending = []
    t0 = time.perf_counter()
    for i in range(iters // AGG):
        counts, diags = scan_group(
            fused, tab.fp, tab.keys, tab.vals, counts
        )
        pending.append(diags)
        if len(pending) * AGG >= drain:
            _ = np.asarray(jnp.concatenate(pending))  # one RTT per window
            pending.clear()
    if pending:
        _ = np.asarray(jnp.concatenate(pending))
    _ = int(counts[0])
    dt = time.perf_counter() - t0
    bases_per_s = iters * B * L / dt

    if _watchdog is not None:
        _watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": "count_bases_per_s",
                "value": round(bases_per_s, 1),
                "unit": "base/s",
                "vs_baseline": round(bases_per_s / REF_BASES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

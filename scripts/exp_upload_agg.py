"""Producer-pipeline budget + upload-aggregation shootout.

Measured (TPU v5e via tunnel, 836 MB FASTQ, dense packing, 2026-08-17):

    reader only                         276 Mbase/s
    reader+pack (native)                390 Mbase/s
    reader+pack+fuse                    377 Mbase/s
    + per-batch 3 MB uploads (agg=1)     33-110 Mbase/s   <- fixed ~50 ms/transfer
    + aggregated uploads    (agg=4)     266 Mbase/s
    + aggregated uploads    (agg=8)     294 Mbase/s

Conclusion: each host->device transfer carries a large fixed cost on the
tunneled runtime, so the engine stages AGG=4 packed batches per upload
(count/engine.py) — the aggregate transfer rides at bulk bandwidth and
the producer thread stops being the end-to-end bottleneck (engine stage
budget: wait 4.2 s -> 1.0 s over 51 batches; 67 -> 93 Mbase/s e2e).

Usage: python scripts/exp_upload_agg.py <reads.fq>
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    fq = sys.argv[1]
    import jax
    import jax.numpy as jnp

    from ntsm_tpu.count.kernel_v2 import pack_batch_fast
    from ntsm_tpu.count.kernel_v3 import fuse_packed
    from ntsm_tpu.io.fastx import BatchReader

    def reader():
        return BatchReader([fq], k=19, seglen=256, batch=32768, dense=True)

    t0 = time.perf_counter()
    nbytes = 0
    for batch in reader():
        nbytes += batch.n_bases
        fuse_packed(*pack_batch_fast(batch.codes))
    dt = time.perf_counter() - t0
    print(f"host pipeline only: {dt:.2f}s  {nbytes/dt/1e6:.0f} Mbase/s")

    for agg in (1, 4, 8):
        t0 = time.perf_counter()
        staged, keep = [], []
        for batch in reader():
            staged.append(fuse_packed(*pack_batch_fast(batch.codes)))
            if len(staged) >= agg:
                keep.append(jnp.asarray(np.stack(staged)))
                staged.clear()
                if len(keep) > 2:
                    keep.pop(0)  # bounded live set, like the upload queue
        if staged:
            keep.append(jnp.asarray(np.stack(staged)))
        jax.block_until_ready(keep)
        dt = time.perf_counter() - t0
        print(f"+ upload agg={agg}: {dt:.2f}s  {nbytes/dt/1e6:.0f} Mbase/s")


if __name__ == "__main__":
    main()

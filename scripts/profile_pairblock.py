"""Bound classification for the -p pair-block kernel at production shape.

BASELINE r4 recorded the -p device-scoring stage at 154.8 s for 4.07M
candidate pairs (994 blocks of 4096) but never split it into device
compute vs fetch: the [7, P] blob (28 B/pair after the round-4 fold;
44 before) is tiny, so if compute owns the stage the remaining lever is
the kernel, not the wire.

Method (honest on the tunneled runtime — CLAUDE.md timing rules):
chain B dependent _pair_block_stats calls through a carry (each block's
ii derives from the previous blob's first element, forcing sequential
device execution), fetch one scalar — that wall is pure device compute
+ one RTT.  Then time the grouped fetch exactly as compute_score_pca_tpu
issues it (PCA_FETCH_GROUP stacked blobs, np.asarray) for the transfer
side.  Synthetic planes: the kernel's cost is data-independent
(elementwise ops + gathers), so random u8 planes at [N, 96512] measure
the production shape without a cohort.

Usage: python scripts/profile_pairblock.py [n_blocks=16]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SITES = 96287


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import jax.numpy as jnp

    import ntsm_tpu  # noqa: F401  (compile cache setup)
    from ntsm_tpu.eval.kernels import CHUNK, PAIR_BLOCK, _pair_block_stats

    Lp = -(-N_SITES // CHUNK) * CHUNK  # 96512: the production plane pad
    N = 1024
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.integers(0, 40, size=(N, Lp), dtype=np.uint8))
    B = jnp.asarray(rng.integers(0, 40, size=(N, Lp), dtype=np.uint8))
    ii = jnp.asarray(rng.integers(0, N, size=PAIR_BLOCK, dtype=np.int32))
    jj = jnp.asarray(rng.integers(0, N, size=PAIR_BLOCK, dtype=np.int32))

    kw = dict(mc=1.0, chunk=CHUNK, n_valid=N_SITES)

    t0 = time.perf_counter()
    blob = _pair_block_stats(A, B, ii, jj, **kw)
    np.asarray(blob)
    print(f"first call (compile+run): {time.perf_counter()-t0:.1f} s",
          flush=True)

    # --- device compute: chained dependent blocks, one scalar fetch ---
    t0 = time.perf_counter()
    cur_ii = ii
    for _ in range(n_blocks):
        blob = _pair_block_stats(A, B, cur_ii, jj, **kw)
        # data dependence: next block's indices derive from this blob
        cur_ii = (ii + blob[0].astype(jnp.int32) % 2) % N
    anchor = float(blob[0, 0])
    dt = time.perf_counter() - t0
    print(
        f"chained compute: {n_blocks} blocks in {dt:.2f} s -> "
        f"{dt/n_blocks*1e3:.1f} ms/block ({PAIR_BLOCK*n_blocks/dt/1e3:.1f}K "
        f"pairs/s device-side); anchor {anchor}",
        flush=True,
    )

    # --- grouped fetch exactly like compute_score_pca_tpu ---
    from ntsm_tpu.eval.tpu import PCA_FETCH_GROUP

    devs = [
        _pair_block_stats(A, B, (ii + k) % N, jj, **kw)
        for k in range(PCA_FETCH_GROUP)
    ]
    stacked = jnp.stack(devs)
    stacked.block_until_ready()
    t0 = time.perf_counter()
    host = np.asarray(stacked)
    dt = time.perf_counter() - t0
    print(
        f"group fetch: {host.nbytes/1e6:.1f} MB in {dt:.2f} s -> "
        f"{host.nbytes/1e6/dt:.1f} MB/s "
        f"({dt/PCA_FETCH_GROUP*1e3:.0f} ms/block amortized)",
        flush=True,
    )


if __name__ == "__main__":
    main()

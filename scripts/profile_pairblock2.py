"""A/B: the round-4 -p pair-block kernel vs the fused chunked v2 kernel
(VERDICT r4 #1) at production shape, same session, both orders.

The old kernel (_pair_block_stats) gathers whole [P, Lp] f32 rows and
materializes every genotype/s1 plane as a [P, Lp] array before its scan
(~40 GB of HBM traffic per 4096-pair block at the 96K-site scale); the
v2 kernel (_pair_block_stats_v2) gathers [P, c] row chunks INSIDE the
scan so intermediates stay VMEM-sized.  Method per CLAUDE.md timing
rules: chain B dependent blocks through a carry, fetch one scalar.

Usage: python scripts/profile_pairblock2.py [n_blocks=16] [rounds=2]
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
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import jax.numpy as jnp

    import ntsm_tpu  # noqa: F401  (compile cache setup)
    from ntsm_tpu.eval.kernels import (
        CHUNK,
        PAIR_BLOCK,
        _chunk_planes,
        _pair_block_stats,
        _pair_block_stats_v2,
    )

    Lp = -(-N_SITES // CHUNK) * CHUNK
    N = 1024
    rng = np.random.default_rng(1)
    # --u16 measures the streamed engine's gather-plane dtype (its block
    # buffer is u16 so mid-stream count escalation never reallocates)
    dt = np.uint16 if "--u16" in sys.argv else np.uint8
    A = jnp.asarray(rng.integers(0, 40, size=(N, Lp)).astype(dt))
    B = jnp.asarray(rng.integers(0, 40, size=(N, Lp)).astype(dt))
    planes = {}
    for g in (1, 4, 8, 16):
        planes[g] = _chunk_planes(A, B, g)
        planes[g].block_until_ready()
    ii = jnp.asarray(rng.integers(0, N, size=PAIR_BLOCK, dtype=np.int32))
    jj = jnp.asarray(rng.integers(0, N, size=PAIR_BLOCK, dtype=np.int32))

    def run_old():
        cur_ii = ii
        blob = None
        for _ in range(n_blocks):
            blob = _pair_block_stats(
                A, B, cur_ii, jj, mc=1.0, chunk=CHUNK, n_valid=N_SITES
            )
            cur_ii = (ii + blob[0].astype(jnp.int32) % 2) % N
        return float(blob[0, 0])

    def make_run_new(g):
        F_t = planes[g]

        def run():
            cur_ii = ii
            out = None
            for _ in range(n_blocks):
                out = _pair_block_stats_v2(
                    F_t, cur_ii, jj, mc=1.0, n_valid=N_SITES, narrow=True,
                    g=g,
                )
                cur_ii = (ii + out[1][0].astype(jnp.int32) % 2) % N
            return float(out[0][0, 0])

        return run

    variants = [("old", run_old)] + [
        (f"new_g{g}", make_run_new(g)) for g in planes
    ]
    # compile + warm all
    for name, fn in variants:
        print(f"warm {name}: anchor {fn()}", flush=True)

    for r in range(rounds):
        order = variants if r % 2 == 0 else variants[::-1]
        for name, fn in order:
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            print(
                f"round {r} {name}: {n_blocks} blocks in {dt:.2f} s -> "
                f"{dt/n_blocks*1e3:.1f} ms/block "
                f"({PAIR_BLOCK*n_blocks/dt/1e3:.1f}K pairs/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Why does _pair_block_stats_v2 run ~1 s/block inside the streamed -p
engine when profile_pairblock2 measured 18.7 ms/block?

The microbenchmark ran u8 planes at Npad=1024; the engine runs u16
planes at Npad=3328 (BLOCK_ROWS-padded N=3202) with an F_t built by
per-block _fuse_block/_ft_insert writes rather than one _chunk_planes
call.  This sweep isolates the three deltas at the production site
count (chained-carry timing per CLAUDE.md):

  dtype x Npad grid, planes from _chunk_planes     (shape/dtype effect)
  u16 @ 3328, planes from _fuse_block/_ft_insert   (layout/provenance)

Usage: python scripts/exp_pairblock_shape.py [n_blocks=8] [rounds=2]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SITES = 96287


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import jax.numpy as jnp

    import ntsm_tpu  # noqa: F401  (compile cache setup)
    from ntsm_tpu.eval.kernels import (
        CHUNK,
        PAIR_BLOCK,
        PAIR_GATHER_CHUNKS,
        _chunk_planes,
        _pair_block_stats_v2,
    )
    from ntsm_tpu.eval.pca_stream import _fuse_block, _ft_insert, _ft_shape

    g = PAIR_GATHER_CHUNKS
    Lp = -(-N_SITES // CHUNK) * CHUNK
    rng = np.random.default_rng(1)

    def bench(label, F_t, N):
        ii = jnp.asarray(rng.integers(0, N, size=PAIR_BLOCK, dtype=np.int32))
        jj = jnp.asarray(rng.integers(0, N, size=PAIR_BLOCK, dtype=np.int32))

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

        print(f"warm {label}: anchor {run()}", flush=True)
        for r in range(rounds):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            print(
                f"{label} r{r}: {dt/n_blocks*1e3:.1f} ms/block "
                f"({PAIR_BLOCK*n_blocks/dt/1e3:.1f}K pairs/s)",
                flush=True,
            )

    for dt_np, dname in ((np.uint8, "u8"), (np.uint16, "u16")):
        for N in (1024, 3328):
            A = jnp.asarray(rng.integers(0, 40, size=(N, Lp)).astype(dt_np))
            B = jnp.asarray(rng.integers(0, 40, size=(N, Lp)).astype(dt_np))
            F_t = _chunk_planes(A, B, g)
            F_t.block_until_ready()
            bench(f"chunk_planes {dname} N={N}", F_t, N)
            del F_t, A, B

    # engine-provenance planes: u16 block inserts at the -p shape
    N = 3202
    Cg, Npad, w = _ft_shape(N, Lp, g)
    F_t = jnp.zeros((Cg, Npad, w), jnp.uint16)
    from ntsm_tpu.eval.pca_stream import BLOCK_ROWS

    for s0 in range(0, N, BLOCK_ROWS):
        s1 = min(s0 + BLOCK_ROWS, N)
        a = jnp.asarray(rng.integers(0, 40, size=(s1 - s0, Lp), dtype=np.uint16))
        b = jnp.asarray(rng.integers(0, 40, size=(s1 - s0, Lp), dtype=np.uint16))
        blk = _fuse_block(a, b, pad_cols=(Cg * w // 2) - Lp,
                          pad_rows=BLOCK_ROWS - (s1 - s0))
        F_t = _ft_insert(F_t, blk, jnp.int32(s0))
    F_t.block_until_ready()
    bench(f"ft_insert u16 N={Npad}", F_t, N)


if __name__ == "__main__":
    main()

"""Rect-engine stage profile: per-dispatch cost of _rect_block_stats at
the production shape ([128 rows x 256 cols] x Lp=96512 sites), measured
with honest synchronization (scalar-force before the clock stops), plus
the fetch cost of one packed rect and the host scatter.

The implied score-phase wall at N is:
    ceil(N/128) tiles x avg ceil(t1/256) slabs x per-rect  (compute)
  + total-rect-bytes / fetch-MB/s                          (fetch, overlapped)

Usage: python scripts/profile_rect.py [N_eq=1024] [reps=6]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SITES = 96287


def main() -> None:
    n_eq = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = np.random.default_rng(42)

    import jax
    import jax.numpy as jnp

    from ntsm_tpu.eval.rect import COLS, ROWS, _rect_block_stats
    from ntsm_tpu.eval.kernels import CHUNK

    Lp = N_SITES + ((-N_SITES) % CHUNK)
    geno = rng.integers(0, 3, size=(COLS, N_SITES))
    lam = 15.0
    at = rng.poisson(lam * (2 - geno)).astype(np.uint16)
    cg = rng.poisson(lam * geno).astype(np.uint16)
    blk_a = np.zeros((COLS, Lp), np.uint16)
    blk_b = np.zeros((COLS, Lp), np.uint16)
    blk_a[:, :N_SITES] = at
    blk_b[:, :N_SITES] = cg
    a_d = jax.device_put(blk_a)
    b_d = jax.device_put(blk_b)
    float(jnp.sum(a_d.astype(jnp.float32)) + jnp.sum(b_d.astype(jnp.float32)))

    def force(parts):
        s = sum(
            jnp.sum(x.astype(jnp.float32)) for x in parts if x is not None
        )
        return float(s)

    kw = dict(mc=1.0, chunk=CHUNK, n_valid=N_SITES, narrow=True)
    t0 = time.perf_counter()
    parts = _rect_block_stats(a_d, b_d, 0, a_d, b_d, **kw)
    force(parts)
    t_cold = time.perf_counter() - t0
    print(f"cold (compile+run): {t_cold:7.2f} s")

    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        parts = _rect_block_stats(a_d, b_d, (r % 2) * ROWS, a_d, b_d, **kw)
        force(parts)
        times.append(time.perf_counter() - t0)
    per = float(np.median(times))
    pairs = ROWS * COLS
    print(f"warm per-rect: median {per*1e3:8.1f} ms "
          f"(min {min(times)*1e3:.1f} max {max(times)*1e3:.1f}); "
          f"{pairs/per:,.0f} rect-pairs/s; "
          f"{pairs*Lp/per/1e12:.2f} T pair-sites/s")

    # fetch one rect blob
    nb = sum(x.nbytes for x in parts if x is not None)
    t0 = time.perf_counter()
    host = [None if x is None else np.asarray(x) for x in parts]
    t_fetch = time.perf_counter() - t0
    print(f"fetch {nb/1e3:.0f} KB: {t_fetch*1e3:7.1f} ms "
          f"({nb/1e6/t_fetch:6.1f} MB/s)")

    # implied walls
    for N in (1024, 3202, n_eq):
        tiles = -(-N // ROWS)
        rects = sum((t * ROWS // COLS) + 1 for t in range(tiles))
        comp = rects * per
        fetch = rects * nb / 1e6 / (nb / 1e6 / t_fetch)
        print(f"N={N}: {rects} rects -> compute {comp:6.1f} s, "
              f"serial fetch {fetch:6.1f} s (overlapped in production)")
    _ = host


if __name__ == "__main__":
    main()

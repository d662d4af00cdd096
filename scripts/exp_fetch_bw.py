"""Device->host fetch bandwidth on the axon tunnel: is the measured
~8 MB/s a true link bound or per-transfer round-trip overhead?

Fetches the same ~50 MB as: (a) 12 separate [N,N]-ish arrays (the score
phase's natural shape), (b) one contiguous f32 array, (c) jax.device_get
on the whole tree at once, (d) a sequence of small 0.5 MB arrays (the
joint-tile shape).  A/B repeated twice, interleaved, per CLAUDE.md's
distrust-single-numbers rule.

Usage: python scripts/exp_fetch_bw.py [MB=50]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
    import jax
    import jax.numpy as jnp

    n = int((mb * 1e6 / 4) ** 0.5)
    k = 12
    big = jax.device_put(np.ones((k, n, n), np.float32))
    float(jnp.sum(big))  # force upload + warm

    def t_many():
        t0 = time.perf_counter()
        for i in range(k):
            np.asarray(big[i])  # device-side slice view -> fetch
        return time.perf_counter() - t0

    # pre-split device arrays (no slicing op in the timed region)
    parts = [jax.device_put(np.ones((n, n), np.float32)) for _ in range(k)]
    float(sum(jnp.sum(p) for p in parts))

    def t_parts():
        t0 = time.perf_counter()
        for p in parts:
            np.asarray(p)
        return time.perf_counter() - t0

    def t_one():
        t0 = time.perf_counter()
        np.asarray(big.reshape(-1))
        return time.perf_counter() - t0

    def t_get():
        t0 = time.perf_counter()
        jax.device_get(parts)
        return time.perf_counter() - t0

    small = [jax.device_put(np.ones((64, 2048), np.float32)) for _ in range(32)]
    float(sum(jnp.sum(s) for s in small))
    sb = sum(s.nbytes for s in small)

    def t_small():
        t0 = time.perf_counter()
        for s in small:
            np.asarray(s)
        return time.perf_counter() - t0

    nb = big.nbytes
    for rnd in range(2):
        for name, fn, bytes_ in [
            ("12 parts", t_parts, nb),
            ("one blob", t_one, nb),
            ("device_get", t_get, nb),
            ("32x0.5MB", t_small, sb),
            ("12 slices", t_many, nb),
        ]:
            dt = fn()
            print(
                f"r{rnd} {name:10s}: {dt:7.2f} s  {bytes_/1e6/dt:7.1f} MB/s"
            )


if __name__ == "__main__":
    main()

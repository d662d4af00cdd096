"""Is the axon tunnel full- or half-duplex? (round 4)

The rect engine overlaps its 149 MB statistic fetch with the load
phase's 310 MB plane upload.  On the most degraded link window the
overlap bought nothing (square 265.5 s vs rect 270.8 s at N=3202) —
consistent with a half-duplex tunnel where concurrent transfers share
one channel.  This pins it: measure upload-only, fetch-only, then both
concurrently (one uploader thread, one fetcher thread, same volumes),
interleaved rounds.

  duplex_ratio = (up_only_s + down_only_s) / concurrent_s

~2.0 ⇒ full-duplex (overlap doubles throughput; keep overlapping).
~1.0 ⇒ half-duplex (only byte cuts help; overlap still hides latency).

Fetch-side cache trap: np.asarray on an already-fetched device array is
free (host copy cache), so every fetched buffer is freshly produced by a
device add.

Usage: python scripts/exp_duplex.py [MB=24] [rounds=3]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n_up = 4  # transfers per arm (amortize per-call RTT like the engine)
    up_bytes = int(mb * 1e6 / n_up)
    ups = [
        np.frombuffer(rng.bytes(up_bytes), np.uint8) for _ in range(2)
    ]

    base = jnp.asarray(
        np.frombuffer(rng.bytes(int(mb * 1e6 // n_up)), np.uint8)
    )
    jnp.sum(base.astype(jnp.int32)).block_until_ready()
    seq = [0]

    def fresh_dev():
        seq[0] += 1
        return base + np.uint8(seq[0] % 251)

    def up_arm() -> float:
        t0 = time.perf_counter()
        d = None
        for i in range(n_up):
            d = jnp.asarray(ups[i % 2])
        int(jnp.sum(d[:8].astype(jnp.int32)))  # sync the queue
        return time.perf_counter() - t0

    def down_arm() -> float:
        devs = [fresh_dev() for _ in range(n_up)]
        for d in devs:
            d.block_until_ready()
        t0 = time.perf_counter()
        for d in devs:
            np.asarray(d)
        return time.perf_counter() - t0

    # warm both arms (paging, executables for the add)
    up_arm()
    down_arm()

    res = {"up": [], "down": [], "both": []}
    for r in range(rounds):
        res["up"].append(up_arm())
        res["down"].append(down_arm())
        # concurrent: pre-build fetch buffers OUTSIDE the timed window
        devs = [fresh_dev() for _ in range(n_up)]
        for d in devs:
            d.block_until_ready()
        t_up = [0.0]

        def up_thread():
            t_up[0] = up_arm()

        th = threading.Thread(target=up_thread)
        t0 = time.perf_counter()
        th.start()
        for d in devs:
            np.asarray(d)
        t_down_c = time.perf_counter() - t0
        th.join()
        both = time.perf_counter() - t0
        res["both"].append(both)
        print(
            f"# round {r}: up {res['up'][-1]:6.2f} s | down "
            f"{res['down'][-1]:6.2f} s | concurrent {both:6.2f} s "
            f"(down part {t_down_c:6.2f}, up part {t_up[0]:6.2f})",
            file=sys.stderr, flush=True,
        )

    up_m = float(np.median(res["up"]))
    down_m = float(np.median(res["down"]))
    both_m = float(np.median(res["both"]))
    print(json.dumps({
        "metric": "tunnel_duplex",
        "mb_each_way": mb,
        "up_only_s": round(up_m, 2),
        "down_only_s": round(down_m, 2),
        "concurrent_s": round(both_m, 2),
        "up_MBps": round(mb / up_m, 2),
        "down_MBps": round(mb / down_m, 2),
        "duplex_ratio": round((up_m + down_m) / both_m, 2),
        "rounds": rounds,
        "all": {k: [round(x, 2) for x in v] for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()

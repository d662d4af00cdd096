"""VERDICT r1 #8: can explicit per-row async DMA beat XLA's gather for the
v3 fingerprint probe?

The probe is a random gather of 3.9M 8-byte rows per batch from a ~34 MB
HBM-resident plane; XLA's gather does it in ~18.5 ms (~210M rows/s, the
measured HBM probe-rate bound — scripts/profile_v3g.py).  Mosaic cannot
express a vectorized row gather (exp_pallas_gather2.py), so the only
Pallas formulation left is scalar-indexed `pltpu.make_async_copy` row
fetches, S-deep pipelined.

Mosaic constraint found while building this (TPU v5e, jax 0.8):
a DMA whose VMEM destination has < 128 lanes fails to compile (the
remote helper 500s on a [1, 8] u8/i32 ring slot); 128-lane slots
compile and run.  So the minimum fetch is a 512-byte [1, 128] i32 row —
the plane is viewed as [NB/64, 128] u32 (64 buckets' fp rows per DMA
row), and the kernel fetches the row containing each probed bucket.

RESULT (TPU v5e, 2026-08-16, 4096 probes/launch x 512 launches per
dispatch, tunnel RTT ~33 ms subtracted for the kernel-side rate):

    depth=4     10.4 M rows/s measured  (~12.5 M rows/s kernel-side)
    depth=16    21.4 M rows/s measured  (~32   M rows/s kernel-side)
    depth=64    21.4 M rows/s measured  (~32   M rows/s kernel-side)

i.e. ~31 ns per DMA at depth>=16 and flat beyond — the bottleneck is the
scalar core's issue loop (address computation + start/wait bookkeeping),
not HBM.  That is ~6.5x below the XLA gather's ~210M rows/s, and each
DMA here already moves 512 B (64 buckets) vs the gather's 8 B rows.
NEGATIVE RESULT: a per-probe DMA formulation cannot approach the XLA
gather; the v3 probe stays on XLA's gather.  (Recorded per VERDICT r1
item 8.)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

NB = 1 << 22  # 4.2M buckets x 8 slots u8 = 34 MB (the real v3 fp plane)
ROWS = NB // 64  # [ROWS, 128] u32 view: 64 bucket-rows per 512B DMA row
N_IDX = 4096  # probes per kernel launch (16 KB of SMEM indices)
SCAN = 512  # launches per timed dispatch (amortizes the tunnel RTT)


def make_probe(depth: int):
    def kernel(idx_ref, fp_hbm, out_ref, ring, sems):
        def dma(i):
            slot = jax.lax.rem(i, depth)
            return pltpu.make_async_copy(
                fp_hbm.at[pl.ds(idx_ref[i], 1), :],
                ring.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        def start(i, _):
            dma(i).start()
            return 0

        jax.lax.fori_loop(0, depth, start, 0)

        def body(i, acc):
            dma(i).wait()
            acc = acc ^ ring[jax.lax.rem(i, depth), :]

            @pl.when(i + depth < N_IDX)
            def _():
                dma(i + depth).start()

            return acc

        acc = jax.lax.fori_loop(
            0, N_IDX, body, jnp.zeros((128,), dtype=jnp.uint32)
        )
        out_ref[0, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )

    def probe(idx, fp):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.uint32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, fp)

    @jax.jit
    def run(idx_s, fp):
        def body(acc, idx):
            return acc ^ probe(idx, fp)[0], None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((128,), jnp.uint32), idx_s
        )
        return acc

    return run


def main():
    rng = np.random.default_rng(0)
    fp = jnp.asarray(
        rng.integers(0, 2**32, size=(ROWS, 128), dtype=np.uint32)
    )
    idx_s = jnp.asarray(
        rng.integers(0, ROWS, size=(SCAN, N_IDX), dtype=np.int32)
    )

    # correctness oracle on the first launch's indices
    exp = np.zeros(128, dtype=np.uint32)
    fp_np = np.asarray(fp)
    for s in range(SCAN):
        exp ^= np.bitwise_xor.reduce(fp_np[np.asarray(idx_s[s])], axis=0)

    for depth in (4, 16, 64):
        try:
            run = make_probe(depth)
            out = np.asarray(run(idx_s, fp))
            ok = np.array_equal(out, exp)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = run(idx_s, fp)
                _ = np.asarray(out)
            dt = (time.perf_counter() - t0) / reps
            n = SCAN * N_IDX
            print(
                f"DMA probe depth={depth:3d}: {dt*1e3:8.2f} ms for {n} rows "
                f"({n/dt/1e6:6.2f} M rows/s)  correct={ok}"
            )
        except Exception as e:
            print(f"DMA probe depth={depth}: FAILED {str(e)[:300]}")


if __name__ == "__main__":
    main()

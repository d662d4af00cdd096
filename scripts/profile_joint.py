"""Where does the eval score phase spend device time?

Times the three device stages of compute_pair_stats_tpu on synthetic
device-resident planes (no upload in the timed region): the indicator
tally matmuls, the s1 chunked matmuls, the joint INTEGER matmuls, and the
joint FRACTIONAL elementwise pass (_joint_tiles) — the O(N^2 * sites)
stage that is the Pallas-kernel candidate.

Usage: python scripts/profile_joint.py [N]   (single TPU process only)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ntsm_tpu.eval.tpu import (
    CHUNK,
    ROW_TILE,
    _chunked_matmul_f64,
    _genotype_planes,
    _joint_int_matmuls,
    _joint_tiles,
    _tally_matmuls,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = 96287
Lp = ((L + CHUNK - 1) // CHUNK) * CHUNK
mc = jnp.float32(1.0)

key = jax.random.PRNGKey(0)
ka, kb = jax.random.split(key)
a = jax.random.randint(ka, (N, Lp), 0, 40).astype(jnp.float32)
b = jax.random.randint(kb, (N, Lp), 0, 40).astype(jnp.float32)
jax.block_until_ready((a, b))


def _fetch(out):
    # CLAUDE.md rule: block_until_ready under-reports on this platform —
    # materialize a host value so the timing covers real completion
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).ravel()[0])


def timed(label, fn, *args, reps=3):
    _fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        _fetch(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s}: {dt*1e3:9.1f} ms")
    return dt


@jax.jit
def planes(a, b):
    return _genotype_planes(a, b, mc)


het, hom_at, hom_cg, vall, s_int, s_frac = jax.block_until_ready(planes(a, b))

C = Lp // CHUNK
cshape = (N, C, CHUNK)

timed("genotype planes", planes, a, b)
timed(
    "tally matmuls",
    jax.jit(lambda h, ha, hc, v: _tally_matmuls(h, ha, hc, v, h, ha, hc, v)),
    het, hom_at, hom_cg, vall,
)
timed(
    "s1 chunked matmuls (x2)",
    jax.jit(
        lambda si, sf, v: (
            _chunked_matmul_f64(si.reshape(cshape), v.reshape(cshape)),
            _chunked_matmul_f64(sf.reshape(cshape), v.reshape(cshape)),
        )
    ),
    s_int, s_frac, vall,
)
timed(
    "joint INT matmuls",
    jax.jit(lambda a, b, v: _joint_int_matmuls(a, b, v, a, b, v, 1.0, CHUNK)),
    a, b, vall,
)

# fractional joint pass, one ROW_TILE against the full cohort
a_t = jnp.swapaxes(a.reshape(cshape), 0, 1)  # [C, N, c]
b_t = jnp.swapaxes(b.reshape(cshape), 0, 1)
v_t = jnp.swapaxes(vall.reshape(cshape), 0, 1)
ai = a_t[:, :ROW_TILE]
bi = b_t[:, :ROW_TILE]
vi = v_t[:, :ROW_TILE]
dt_tile = timed(
    f"joint FRAC tile [{ROW_TILE},N]",
    jax.jit(lambda *x: _joint_tiles(*x, mc)),
    ai, bi, vi, a_t, b_t, v_t,
)
n_tiles = (N + ROW_TILE - 1) // ROW_TILE
print(
    f"-> full fractional pass = {n_tiles} tiles x {dt_tile*1e3:.0f} ms "
    f"= {n_tiles*dt_tile:.1f} s for {N*(N-1)//2} pairs"
)
flops = ROW_TILE * N * Lp * 10
print(f"-> tile arithmetic: ~{flops/dt_tile/1e12:.2f} Tflop/s effective")

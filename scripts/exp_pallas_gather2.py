"""Find the 2D gather form Mosaic supports."""
import sys, traceback
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
R = 256

def try_kernel(name, kfn, out_shape, *arrs):
    def run(*a):
        return pl.pallas_call(
            kfn,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    try:
        out = jax.jit(run)(*arrs)
        print(f"{name}: OK, out shape {out.shape}")
        return np.asarray(out)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"{name}: FAIL {msg}")
        return None

# A: 2D table [4096,128], 2D idx [4096,128] in [0,4096), gather along axis 0 (per-lane column gather)
tblA = jnp.asarray(rng.integers(0, 2**31, size=(4096, 128), dtype=np.int32))
idxA = jnp.asarray(rng.integers(0, 4096, size=(4096, 128), dtype=np.int32))
def kA(t, i, o):
    o[:] = jnp.take_along_axis(t[:], i[:], axis=0)
outA = try_kernel("A take_along_axis axis=0 same-shape", kA,
                  jax.ShapeDtypeStruct((4096, 128), jnp.int32), tblA, idxA)
if outA is not None:
    exp = np.take_along_axis(np.asarray(tblA), np.asarray(idxA), axis=0)
    print("   correct:", np.array_equal(outA, exp))

# B: smaller idx rows: [256,128] idx into [4096,128] table, axis 0
idxB = jnp.asarray(rng.integers(0, 4096, size=(R, 128), dtype=np.int32))
def kB(t, i, o):
    o[:] = jnp.take_along_axis(t[:], i[:], axis=0)
outB = try_kernel("B take_along_axis axis=0 fewer rows", kB,
                  jax.ShapeDtypeStruct((R, 128), jnp.int32), tblA, idxB)
if outB is not None:
    exp = np.take_along_axis(np.asarray(tblA), np.asarray(idxB), axis=0)
    print("   correct:", np.array_equal(outB, exp))

# C: axis=1 (within-row lane gather)
idxC = jnp.asarray(rng.integers(0, 128, size=(4096, 128), dtype=np.int32))
def kC(t, i, o):
    o[:] = jnp.take_along_axis(t[:], i[:], axis=1)
outC = try_kernel("C take_along_axis axis=1", kC,
                  jax.ShapeDtypeStruct((4096, 128), jnp.int32), tblA, idxC)
if outC is not None:
    exp = np.take_along_axis(np.asarray(tblA), np.asarray(idxC), axis=1)
    print("   correct:", np.array_equal(outC, exp))

# D: row gather via integer-array indexing t[i] with 1D idx
idxD = jnp.asarray(rng.integers(0, 4096, size=(R,), dtype=np.int32))
def kD(t, i, o):
    o[:] = t[:][i[:]]
outD = try_kernel("D row gather t[idx1d]", kD,
                  jax.ShapeDtypeStruct((R, 128), jnp.int32), tblA, idxD)

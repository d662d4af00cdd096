"""Does Mosaic lower a vectorized dynamic gather from a VMEM table? How fast?"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TBL = 1 << 20  # 4MB u32 table in VMEM

def kernel(tbl_ref, idx_ref, out_ref):
    idx = idx_ref[:]            # [R, 128] i32
    tbl = tbl_ref[:]            # [TBL] u32 (VMEM)
    out_ref[:] = tbl[idx]       # vectorized dynamic gather?

def run(tbl, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)

rng = np.random.default_rng(0)
tbl = jnp.asarray(rng.integers(0, 2**32, size=TBL, dtype=np.uint32))
R = 4096
idx = jnp.asarray(rng.integers(0, TBL, size=(R, 128), dtype=np.int32))

try:
    out = jax.jit(run)(tbl, idx)
    exp = np.asarray(tbl)[np.asarray(idx)]
    print("1D-table gather compiles; correct:", np.array_equal(np.asarray(out), exp))
except Exception as e:
    print("1D-table gather FAILED:", str(e)[:500])

# variant: 2D table, take_along_axis within rows
def kernel2(tbl_ref, idx_ref, out_ref):
    # tbl [8192, 128] u32; idx [R,128] values in [0, 8192): gather along axis 0 per lane
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

def run2(tbl2, idx2):
    return pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct(idx2.shape, jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl2, idx2)

tbl2 = jnp.asarray(rng.integers(0, 2**32, size=(8192, 128), dtype=np.uint32))
idx2 = jnp.asarray(rng.integers(0, 8192, size=(R, 128), dtype=np.int32))
try:
    out2 = jax.jit(run2)(tbl2, idx2)
    exp2 = np.take_along_axis(np.asarray(tbl2), np.asarray(idx2), axis=0)
    print("take_along_axis(axis=0) compiles; correct:", np.array_equal(np.asarray(out2), exp2))
except Exception as e:
    print("take_along_axis FAILED:", str(e)[:500])

# timing of variant(s) that worked, chained to defeat async under-reporting
def chain_time(fn, tblv, idxv, n=30):
    f = jax.jit(fn)
    out = f(tblv, idxv); out.block_until_ready()
    t0 = time.perf_counter()
    o = idxv
    # serialize by feeding output back into the index (mod table size)
    for _ in range(n):
        o = f(tblv, (o & jnp.uint32(tblv.shape[0] - 1)).astype(jnp.int32))
    _ = np.asarray(o).ravel()[0]
    dt = (time.perf_counter() - t0) / n
    per = idxv.size / dt / 1e6
    print(f"  {dt*1e3:.3f} ms for {idxv.size} gathers -> {per:.0f} M gathers/s")

try:
    print("timing 1D-table gather (4MB VMEM table, 524288 idx):")
    chain_time(run, tbl, idx)
except Exception as e:
    print("timing failed:", str(e)[:300])

"""Pallas TPU kernel for the joint-likelihood FRACTIONAL pass.

The all-vs-all eval engine decomposes the joint term per site as
`x^2/t = x - x*y/t` (eval/tpu.py module docstring): the integer part is
exact MXU matmuls; what remains is the data-dependent fraction

    jfrac(i, j) = sum_s  ( [aa>mc] + [bb>mc] ) * aa*bb / max(aa+bb, 1) * m

with aa = a_i+a_j, bb = b_i+b_j, m = valid_i*valid_j — an O(N^2 * sites)
elementwise reduction (reference pair loop: CompareCounts.hpp:1013-1033).
This kernel keeps the [TI, SUB, TJ] working set in VMEM and accumulates
[TI, TJ] output tiles in place across the site grid dimension, with a
two-sum per CK sites, so results match the XLA path to f32 reassociation
noise (measured 0.0 at CK=256, 2.4e-8 at CK=1024).

NEGATIVE RESULT (TPU v5e, N=1024, 96512 sites, device-resident planes,
value-fetch-inclusive timing per the CLAUDE.md methodology rule):

    XLA row-tile pass (_joint_tiles, 16 dispatches)   0.92 s
    this kernel, CK=1024 (24K grid steps)             1.51 s
    (block_until_ready-only timings, which under-report on this
    platform, gave 0.57 s vs 1.35-1.36 s with CK=256 ~= CK=1024 —
    same verdict either way)

The hypothesis was that XLA's [T, N, chunk] broadcast intermediates
stream through HBM; in fact XLA's scan formulation is already within
~2-4x of the VPU flops bound, and the Pallas version loses it on the
3-D broadcast relayouts (same time at 4x fewer grid steps = not
step-overhead-bound).  Kept as an opt-in experiment
(`NTSM_PALLAS_JOINT=1`) and a recorded formulation; the XLA path is the
default everywhere.  Mosaic constraints hit on the way, for the record:
lane-dimension slice offsets must be provable multiples of 128 (hence
SUB=128 slabs), and Python-int fori_loop bounds trace as i64 under
jax_enable_x64, whose i64->i32 convert recurses infinitely in Mosaic
lowering (use jnp.int32 bounds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TI = 32  # output row tile
TJ = 128  # output column tile (lanes)
CK = 1024  # sites per grid step (two-sum cadence; 4x eval.tpu.CHUNK —
#   fewer grid steps, the kernel was grid-overhead-bound at 256)
SUB = 128  # site slab per inner iteration — lane slices must be 128-aligned


def _joint_frac_kernel(ai, bi, vi, ajt, bjt, vjt, hi_ref, lo_ref, *, mc):
    @pl.when(pl.program_id(2) == 0)
    def _():
        hi_ref[:] = jnp.zeros_like(hi_ref)
        lo_ref[:] = jnp.zeros_like(lo_ref)

    mcf = jnp.float32(mc)

    def sub(s, part):
        # Mosaic constraint: a lane-dimension slice offset must be a
        # provable multiple of 128, hence SUB=128 slabs
        off = jax.lax.mul(s, jnp.int32(SUB))
        a_i = ai[:, pl.ds(off, SUB)]  # [TI, SUB]
        b_i = bi[:, pl.ds(off, SUB)]
        v_i = vi[:, pl.ds(off, SUB)]
        a_j = ajt[pl.ds(off, SUB), :]  # [SUB, TJ]
        b_j = bjt[pl.ds(off, SUB), :]
        v_j = vjt[pl.ds(off, SUB), :]
        aa = a_i[:, :, None] + a_j[None, :, :]  # [TI, SUB, TJ]
        bb = b_i[:, :, None] + b_j[None, :, :]
        m = v_i[:, :, None] * v_j[None, :, :]
        pa = (aa > mcf).astype(jnp.float32)
        pb = (bb > mcf).astype(jnp.float32)
        tot = jnp.maximum(aa + bb, 1.0)
        return part + (((pa + pb) * (aa * bb) / tot) * m).sum(axis=1)

    # i32 loop bounds: Python ints trace as i64 under jax_enable_x64 and
    # Mosaic's i64->i32 convert lowering recurses infinitely (jax 0.8)
    part = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(CK // SUB), sub,
        jnp.zeros((TI, TJ), jnp.float32),
    )
    # compensated accumulation across site chunks (Knuth two-sum — the
    # same cadence as tpu._chunked_matmul_f64 / _joint_tiles)
    hi = hi_ref[:]
    lo = lo_ref[:]
    s_ = hi + part
    z = s_ - hi
    e = (hi - (s_ - z)) + (part - z)
    hi_ref[:] = s_
    lo_ref[:] = lo + e


def joint_frac_full(a, b, v, mc: float, *, interpret: bool = False):
    """Full [N, N] fractional joint accumulators in one dispatch.

    a/b/v: [N, Lp] f32 planes (Lp a multiple of CK; rows beyond the real
    sample count must have v == 0 so they contribute nothing).
    Returns (hi, lo) [N, N] f32 — combine as f64 hi+lo on the host.
    """
    N, Lp = a.shape
    pad_l = (-Lp) % CK
    if pad_l:  # padded sites carry v=0 and contribute nothing
        widths = ((0, 0), (0, pad_l))
        a = jnp.pad(a, widths)
        b = jnp.pad(b, widths)
        v = jnp.pad(v, widths)
        Lp += pad_l
    pad = (-N) % max(TI, TJ)  # both grid axes must cover every sample
    if pad:
        widths = ((0, pad), (0, 0))
        a = jnp.pad(a, widths)
        b = jnp.pad(b, widths)
        v = jnp.pad(v, widths)  # zero validity -> zero contribution
    Np = N + pad
    at = a.T  # column orientation for the lane axis ([Lp, Np])
    bt = b.T
    vt = v.T

    kern = functools.partial(_joint_frac_kernel, mc=mc)
    row_spec = pl.BlockSpec(
        (TI, CK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
    )
    col_spec = pl.BlockSpec(
        (CK, TJ), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (TI, TJ), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
    )
    hi, lo = pl.pallas_call(
        kern,
        grid=(Np // TI, Np // TJ, Lp // CK),
        in_specs=[row_spec, row_spec, row_spec, col_spec, col_spec, col_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Np), jnp.float32),
            jax.ShapeDtypeStruct((Np, Np), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b, v, at, bt, vt)
    return hi[:N, :N], lo[:N, :N]

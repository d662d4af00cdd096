"""Pallas TPU kernel for the window-hash stage of the counting engine.

Fuses, in one VMEM-resident pass over a [TB, L] tile of 2-bit read codes:

  * the k rolling-window 2-bit encodings (forward and reverse-complement)
  * the canonical min(fw, rv)
  * the invertible Thomas-Wang hash64 (vendor/KseqHashIterator.hpp:129-139)
  * window validity (k consecutive real bases inside the read)

Mosaic has no 64-bit vector integers, so all 64-bit values are emulated as
(hi, lo) uint32 pairs; hash64 is multiply-free (shifts/adds/xors only) so
the emulation is exact and cheap (an add needs one carry compare).

The table probe deliberately stays in XLA: the bucket-row gather is
HBM-transaction-bound (measured ~18.5 ms for 3.9M 8-byte rows regardless
of formulation), and Mosaic's dynamic-gather support is lane-local only
(take_along_axis(axis=1) with indices < 128 lowers; axis=0 row gathers do
not — probed on v5e; manual per-row DMA measured ~1000x too slow, see
scripts/exp_dma_probe.py).  What remains profitably fusable on the VPU is
exactly this hash stage.

Two entry points:
  * `pallas_window_hashes(codes, lengths, k)` — unpacked u8 codes
    (kept for direct parity tests against kernel.window_hashes).
  * `pallas_window_hashes_packed(packed, vbits, k, L)` — 2-bit packed
    input, same contract as kernel_v2.window_hashes_packed; this is the
    stage `--engine pallas` fuses into the v3 fingerprint probe
    (kernel_v3.count_step_v3(pallas_hash=True)).

Both are testable on CPU via interpret mode.  Reference semantics: the
per-base hot loop of FingerPrint::insertCount (src/FingerPrint.hpp:89-103).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 256  # batch-row tile


# ---- (hi, lo) uint32-pair arithmetic (all shift counts are Python ints) ----


def _shl(hi, lo, s: int):
    if s == 0:
        return hi, lo
    z = jnp.zeros_like(lo)
    if s == 32:
        return lo, z
    if s > 32:
        return lo << (s - 32), z
    return (hi << s) | (lo >> (32 - s)), lo << s


def _shr(hi, lo, s: int):
    if s == 0:
        return hi, lo
    z = jnp.zeros_like(hi)
    if s == 32:
        return z, hi
    if s > 32:
        return z, hi >> (s - 32)
    return hi >> s, (lo >> s) | (hi << (32 - s))


def _add(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return ahi + bhi + carry, lo


def _xor(ahi, alo, bhi, blo):
    return ahi ^ bhi, alo ^ blo


def _mask(hi, lo, mhi: int, mlo: int):
    return hi & jnp.uint32(mhi), lo & jnp.uint32(mlo)


def _hash64_pair(hi, lo, k: int):
    """hash64 on (hi, lo) pairs; mask = 2k bits (core/hash.py:hash64_np)."""
    m = (1 << (2 * k)) - 1 if k < 32 else 0xFFFFFFFFFFFFFFFF
    mhi, mlo = (m >> 32) & 0xFFFFFFFF, m & 0xFFFFFFFF

    # key = (~key + (key << 21)) & mask
    nhi, nlo = ~hi, ~lo
    shi, slo = _shl(hi, lo, 21)
    hi, lo = _mask(*_add(nhi, nlo, shi, slo), mhi, mlo)
    # key ^= key >> 24
    hi, lo = _xor(hi, lo, *_shr(hi, lo, 24))
    # key = (key + (key << 3) + (key << 8)) & mask
    ahi, alo = _add(hi, lo, *_shl(hi, lo, 3))
    hi, lo = _mask(*_add(ahi, alo, *_shl(hi, lo, 8)), mhi, mlo)
    # key ^= key >> 14
    hi, lo = _xor(hi, lo, *_shr(hi, lo, 14))
    # key = (key + (key << 2) + (key << 4)) & mask
    ahi, alo = _add(hi, lo, *_shl(hi, lo, 2))
    hi, lo = _mask(*_add(ahi, alo, *_shl(hi, lo, 4)), mhi, mlo)
    # key ^= key >> 28
    hi, lo = _xor(hi, lo, *_shr(hi, lo, 28))
    # key = (key + (key << 31)) & mask
    hi, lo = _mask(*_add(hi, lo, *_shl(hi, lo, 31)), mhi, mlo)
    return hi, lo


def _roll_left(x, j: int, L: int):
    """cj[:, w] = x[:, (w + j) % L]."""
    if j == 0:
        return x
    return pltpu.roll(x, shift=jnp.int32(L - j), axis=1)


def _hash_core(cc, bad, k: int):
    """Rolling canonical-window hash on [tb, L] u32 codes (values 0..3)
    with a [tb, L] u32 bad mask; returns (h_hi, h_lo, badsum) per base
    position (window w is column w; columns beyond W = L-k+1 are wrapped
    garbage the caller slices off)."""
    L = cc.shape[1]
    comp = cc ^ jnp.uint32(3)
    z = jnp.zeros_like(cc)
    fw_hi, fw_lo = z, z
    rv_hi, rv_lo = z, z
    badsum = jnp.zeros_like(bad)
    for j in range(k):
        cj = _roll_left(cc, j, L)
        pj = _roll_left(comp, j, L)
        bj = _roll_left(bad, j, L)
        fw_hi, fw_lo = _shl(fw_hi, fw_lo, 2)
        fw_lo = fw_lo | cj
        phi, plo = _shl(z, pj, 2 * j)
        rv_hi, rv_lo = rv_hi | phi, rv_lo | plo
        badsum = badsum + bj

    lt = (fw_hi < rv_hi) | ((fw_hi == rv_hi) & (fw_lo < rv_lo))
    canon_hi = jnp.where(lt, fw_hi, rv_hi)
    canon_lo = jnp.where(lt, fw_lo, rv_lo)
    h_hi, h_lo = _hash64_pair(canon_hi, canon_lo, k)
    return h_hi, h_lo, badsum


def _window_hash_kernel(codes_ref, len_ref, hi_ref, lo_ref, valid_ref, *, k: int):
    c8 = codes_ref[:]  # [TB, L] u8
    c = c8.astype(jnp.uint32)
    lengths = len_ref[:]  # [TB, 1] i32
    pos = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    bad = ((c > 3) | (pos >= lengths)).astype(jnp.uint32)
    cc = c & jnp.uint32(3)
    h_hi, h_lo, badsum = _hash_core(cc, bad, k)

    hi_ref[:] = h_hi
    lo_ref[:] = h_lo
    valid_ref[:] = (badsum == 0).astype(jnp.int32)


def _window_hash_kernel_packed(
    packed_ref, vbits_ref, hi_ref, lo_ref, valid_ref, *, k: int
):
    """Same hash core, but unpacks the 2-bit block layout in VMEM
    (kernel_v2.pack_batch: byte j of [tb, L/4] holds bases
    (j, j+L/4, j+L/2, j+3L/4) at bit pairs 0/2/4/6, so the unpack is a
    pure lane concatenation — no shuffles)."""
    p = packed_ref[:].astype(jnp.uint32)  # [tb, L/4]
    v = vbits_ref[:].astype(jnp.uint32)  # [tb, L/8]
    cc = jnp.concatenate(
        [(p >> (2 * i)) & jnp.uint32(3) for i in range(4)], axis=1
    )
    good = jnp.concatenate(
        [(v >> i) & jnp.uint32(1) for i in range(8)], axis=1
    )
    bad = jnp.uint32(1) - good
    h_hi, h_lo, badsum = _hash_core(cc, bad, k)

    hi_ref[:] = h_hi
    lo_ref[:] = h_lo
    valid_ref[:] = (badsum == 0).astype(jnp.int32)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _row_tile(k: int) -> int:
    # large k fully unrolls ~k*12 vector ops per tile; the remote compile
    # helper falls over on 256x256 tiles beyond k~24 — shrink the row tile
    return TB if k <= 24 else TB // 4


def _launch_window_hash(kern, inputs, widths, *, Bp, tb, L, B, W):
    """Shared pallas_call + u64-assembly epilogue for both entry points.

    inputs are [Bp, width]-shaped arrays (already padded to a tb multiple);
    returns (h [B, W] u64, valid [B, W] bool)."""
    # NB: the column index must share the program id's 32-bit type — a bare
    # Python 0 traces as i64 under jax_enable_x64 and Mosaic fails to
    # legalize the index-map return.
    imap = lambda i: (i, jnp.int32(0))  # noqa: E731
    hi, lo, valid = pl.pallas_call(
        kern,
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, w), imap, memory_space=pltpu.VMEM)
            for w in widths
        ],
        out_specs=[
            pl.BlockSpec((tb, L), imap, memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, L), jnp.int32),
        ],
        interpret=_use_interpret(),
    )(*inputs)
    h = (hi[:B, :W].astype(jnp.uint64) << jnp.uint64(32)) | lo[
        :B, :W
    ].astype(jnp.uint64)
    return h, valid[:B, :W] != 0


def pallas_window_hashes(codes, lengths, k: int):
    """[B, L] u8 codes + [B] i32 lengths -> (h [B, W] u64, valid [B, W] bool).

    Same contract as kernel.window_hashes / kernel_v2.window_hashes_packed.
    """
    B, L = codes.shape
    W = L - k + 1
    tb = _row_tile(k)
    pad = (-B) % tb
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)), constant_values=4)
        lengths = jnp.pad(lengths, (0, pad))
    return _launch_window_hash(
        functools.partial(_window_hash_kernel, k=k),
        (codes, lengths.astype(jnp.int32).reshape(-1, 1)),
        (L, 1),
        Bp=B + pad, tb=tb, L=L, B=B, W=W,
    )


def pallas_window_hashes_packed(packed, vbits, k: int, L: int):
    """2-bit packed input -> (h [B, W] u64, valid [B, W] bool).

    Drop-in for kernel_v2.window_hashes_packed; unpack happens in VMEM.
    Pad rows use vbits=0, so every padded window is invalid and the [:B]
    slice is the only cleanup needed.
    """
    B = packed.shape[0]
    W = L - k + 1
    tb = _row_tile(k)
    pad = (-B) % tb
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
        vbits = jnp.pad(vbits, ((0, pad), (0, 0)))
    return _launch_window_hash(
        functools.partial(_window_hash_kernel_packed, k=k),
        (packed, vbits),
        (L // 4, L // 8),
        Bp=B + pad, tb=tb, L=L, B=B, W=W,
    )

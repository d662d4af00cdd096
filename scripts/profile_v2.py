"""Break down the v2 count step on the real TPU: hash / gather / match+pack / top_k."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from ntsm_tpu.count.kernel_v2 import (
    SLOTS_V2, pack_batch, window_hashes_packed, TOPK,
)
from ntsm_tpu.io.sites import build_lookup
from ntsm_tpu.core.hash import hash64_jnp, kmer_mask

print("devices:", jax.devices())

rng = np.random.default_rng(7)
k = 19
mask38 = (1 << (2 * k)) - 1
hashes = np.unique(rng.integers(0, mask38, size=96287 * 26, dtype=np.uint64))
lookup = build_lookup(hashes, slots=SLOTS_V2)
keys = jnp.asarray(lookup.keys)
print("table:", keys.shape, keys.nbytes / 1e6, "MB")

B, L = 16384, 256
codes_np = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
packed_np, vbits_np = pack_batch(codes_np)
packed = jnp.asarray(packed_np)
vbits = jnp.asarray(vbits_np)

import functools

@functools.partial(jax.jit, static_argnames=("k", "L"))
def stage_hash(packed, vbits, *, k, L):
    h, valid = window_hashes_packed(packed, vbits, k, L)
    return h.sum(), valid.sum()

@functools.partial(jax.jit, static_argnames=("k", "L"))
def stage_gather(packed, vbits, keys, *, k, L):
    h, valid = window_hashes_packed(packed, vbits, k, L)
    n_buckets, slots = keys.shape
    bucket = (h & jnp.uint64(n_buckets - 1)).astype(jnp.int32)
    rows = keys[bucket]
    return rows.sum(), valid.sum()

@functools.partial(jax.jit, static_argnames=("k", "L"))
def stage_match(packed, vbits, keys, *, k, L):
    h, valid = window_hashes_packed(packed, vbits, k, L)
    n_buckets, slots = keys.shape
    sbits = (slots - 1).bit_length()
    bucket = (h & jnp.uint64(n_buckets - 1)).astype(jnp.int32)
    rows = keys[bucket]
    match = rows == h[..., None]
    slot = jnp.where(match, jax.lax.broadcasted_iota(jnp.int32, match.shape, 2), slots).min(axis=-1)
    found = match.any(axis=-1) & valid
    packed_hit = jnp.where(found, (bucket << sbits) | slot, -1) + 1
    return packed_hit.sum(), found.sum()

from ntsm_tpu.count.kernel_v2 import count_step_v2

def bench(fn, *args, n=20, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    return dt * 1e3

mb = B * (L - k + 1) / 1e6
print(f"windows/batch: {B*(L-k+1)/1e6:.2f} M; bases {B*L/1e6:.1f} M")
t = bench(stage_hash, packed, vbits, k=k, L=L); print(f"hash only      : {t:8.2f} ms")
t = bench(stage_gather, packed, vbits, keys, k=k, L=L); print(f"+ bucket gather: {t:8.2f} ms")
t = bench(stage_match, packed, vbits, keys, k=k, L=L); print(f"+ match/pack   : {t:8.2f} ms")
t = bench(count_step_v2, packed, vbits, keys, k=k, L=L); print(f"+ top_k (full) : {t:8.2f} ms  -> {B*L/1e3/t:.1f} Mbase/s")

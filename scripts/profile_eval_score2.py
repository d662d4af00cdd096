"""Score-phase sub-stage profile with HONEST synchronization.

profile_eval_score.py trusted block_until_ready, which under-reports on
the axon tunnel (CLAUDE.md rule) — its "fetch_nn 72 s" actually contained
the tallies compute.  Here every stage is forced by fetching a SCALAR
(jnp.sum) from its outputs before the clock stops; full-array fetch is
then timed separately, so compute and device->host transfer are split.

Stages (all warm — each jit is run once cold first):
  tally6      _genotype_planes + the six indicator tally matmuls
  s1pair      2x _chunked_matmul_f64 (compensated 377-step scans)
  jint        _joint_int_matmuls (6x compensated chunked matmuls @ mc=1)
  relayout    the three [N,C,c]->[C,N,c] swapaxes
  full        _planes_and_tallies (everything above in one dispatch)
  fetch       np.asarray of the 10 [N,N] outputs AFTER completion
  joint1      one ROW_TILE joint fractional tile, scalar-forced
  jfetch1     its [T,N] hi/lo fetch after completion

Usage: python scripts/profile_eval_score2.py [N=1024]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SITES = 96287


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(42)
    from scripts.profile_eval_score import synth_planes

    t0 = time.perf_counter()
    at, cg = synth_planes(n, rng)
    print(f"gen {time.perf_counter()-t0:.1f} s", file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from ntsm_tpu.eval import tpu as etpu

    mc = 1.0
    mx = np.stack([at, cg], axis=2)
    a_np = etpu._wire_plane(mx, 0, etpu.CHUNK)
    b_np = etpu._wire_plane(mx, 1, etpu.CHUNK)
    a_d = jax.device_put(a_np)
    b_d = jax.device_put(b_np)
    # force upload completion before any timing
    float(jnp.sum(a_d.astype(jnp.float32)) + jnp.sum(b_d.astype(jnp.float32)))

    chunk = etpu.CHUNK
    Lp = a_np.shape[1]
    C = Lp // chunk

    def force(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return float(s)

    @jax.jit
    def stage_tally(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        het, hom_at, hom_cg, vall, _, _ = etpu._genotype_planes(a, b, mc)
        return etpu._tally_matmuls(
            het, hom_at, hom_cg, vall, het, hom_at, hom_cg, vall
        )

    @jax.jit
    def stage_s1(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        *_, vall, s_int, s_frac = etpu._genotype_planes(a, b, mc)
        cshape = (a.shape[0], C, chunk)
        v_c = vall.reshape(cshape)
        si = etpu._chunked_matmul_f64(s_int.reshape(cshape), v_c)
        sf = etpu._chunked_matmul_f64(s_frac.reshape(cshape), v_c)
        return si, sf

    @jax.jit
    def stage_jint(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        vall = etpu._genotype_planes(a, b, mc)[3]
        return etpu._joint_int_matmuls(a, b, vall, a, b, vall, mc, chunk)

    @jax.jit
    def stage_relayout(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        vall = etpu._genotype_planes(a, b, mc)[3]
        cshape = (a.shape[0], C, chunk)
        a_t = jnp.swapaxes(a.reshape(cshape), 0, 1)
        b_t = jnp.swapaxes(b.reshape(cshape), 0, 1)
        v_t = jnp.swapaxes(vall.reshape(cshape), 0, 1)
        return a_t, b_t, v_t

    rep = {}
    for name, fn in [
        ("tally6", stage_tally),
        ("s1pair", stage_s1),
        ("jint", stage_jint),
        ("relayout", stage_relayout),
    ]:
        out = fn(a_d, b_d)
        force(out)  # cold (compile)
        t0 = time.perf_counter()
        out = fn(a_d, b_d)
        force(out)
        rep[name] = time.perf_counter() - t0

    # the production dispatch, warm, scalar-forced
    out = etpu._planes_and_tallies(a_d, b_d, mc=mc, chunk=chunk)
    force((out[0], out[1], out[2]))
    t0 = time.perf_counter()
    out = etpu._planes_and_tallies(a_d, b_d, mc=mc, chunk=chunk)
    tallies_d, s1_d, jint_d, a_t, b_t, v_t = out
    force((tallies_d, s1_d, jint_d))
    rep["full"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    for v in tallies_d.values():
        np.asarray(v)
    for x in s1_d:
        np.asarray(x)
    for x in jint_d:
        np.asarray(x)
    nb = sum(v.nbytes for v in tallies_d.values()) + sum(
        x.nbytes for x in s1_d
    ) + sum(x.nbytes for x in jint_d)
    rep["fetch"] = time.perf_counter() - t0
    rep["fetch_MB/s"] = nb / 1e6 / rep["fetch"]

    T = etpu.ROW_TILE
    joint_fn = etpu._make_joint_fn(int(mc))
    r = joint_fn(a_t[:, :T], b_t[:, :T], v_t[:, :T], a_t, b_t, v_t)
    force(r)  # cold
    t0 = time.perf_counter()
    r = joint_fn(a_t[:, :T], b_t[:, :T], v_t[:, :T], a_t, b_t, v_t)
    force(r)
    rep["joint1"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(r[0])
    np.asarray(r[1])
    rep["jfetch1"] = time.perf_counter() - t0

    print(f"N={n}  Lp={Lp}  C={C}  fetch_bytes={nb/1e6:.0f} MB")
    for k, v in rep.items():
        print(f"  {k:10s}: {v:8.3f}")
    ntiles = (n + T - 1) // T
    est = rep["full"] + rep["fetch"] + ntiles * (
        rep["joint1"] + rep["jfetch1"]
    )
    print(f"  est score wall (full+fetch+{ntiles}x joint): {est:.1f} s")


if __name__ == "__main__":
    main()

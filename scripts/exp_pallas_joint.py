"""Head-to-head: XLA _joint_tiles vs the Pallas joint-fraction kernel
(eval/pallas_joint.py — NEGATIVE RESULT, see its docstring).
Run: python scripts/exp_pallas_joint.py [N]   (single TPU process only)
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import ntsm_tpu
from ntsm_tpu.eval.tpu import CHUNK, ROW_TILE, _joint_tiles, _make_joint_fn
from ntsm_tpu.eval.pallas_joint import joint_frac_full

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
L = 96287
Lp = ((L + CHUNK - 1) // CHUNK) * CHUNK
key = jax.random.PRNGKey(0)
ka, kb, kv = jax.random.split(key, 3)
a = jax.random.randint(ka, (N, Lp), 0, 40).astype(jnp.float32)
b = jax.random.randint(kb, (N, Lp), 0, 40).astype(jnp.float32)
v = (jax.random.uniform(kv, (N, Lp)) < 0.95).astype(jnp.float32)
jax.block_until_ready((a, b, v))

# XLA row-tile full pass
C = Lp // CHUNK
cs = (N, C, CHUNK)
a_t = jnp.swapaxes(a.reshape(cs), 0, 1)
b_t = jnp.swapaxes(b.reshape(cs), 0, 1)
v_t = jnp.swapaxes(v.reshape(cs), 0, 1)
jax.block_until_ready((a_t, b_t, v_t))
jfn = _make_joint_fn(1)

def xla_full():
    outs = []
    for r0 in range(0, N, ROW_TILE):
        ai = a_t[:, r0:r0+ROW_TILE]
        bi = b_t[:, r0:r0+ROW_TILE]
        vi = v_t[:, r0:r0+ROW_TILE]
        outs.append(jfn(ai, bi, vi, a_t, b_t, v_t))
    # CLAUDE.md rule: block_until_ready under-reports on this platform —
    # fetch every tile's values so the timing covers real completion
    _ = [float(np.asarray(h).ravel()[0]) for h, _ in outs]
    return outs

out_x = xla_full()
t0 = time.perf_counter()
out_x = xla_full()
t_x = time.perf_counter() - t0
print(f"XLA row-tile pass : {t_x:.2f}s (value-fetch-inclusive)")

pj = jax.jit(lambda a,b,v: joint_frac_full(a, b, v, 1.0))
def pallas_full():
    out = pj(a, b, v)
    _ = float(np.asarray(out[0]).ravel()[0])
    return out
out_p = pallas_full()
t0 = time.perf_counter()
out_p = pallas_full()
t_p = time.perf_counter() - t0
print(f"Pallas full pass  : {t_p:.2f}s  ({t_x/t_p:.1f}x, value-fetch-inclusive)")

# numeric agreement
exp = np.concatenate([np.asarray(h).astype(np.float64) + np.asarray(l).astype(np.float64) for h, l in out_x], axis=0)[:N]
got = np.asarray(out_p[0]).astype(np.float64) + np.asarray(out_p[1]).astype(np.float64)
err = np.abs(got - exp) / np.maximum(1.0, np.abs(exp))
print("max rel err vs XLA:", err.max())

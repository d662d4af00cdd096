"""Pallas joint-fraction kernel (interpret mode on CPU): parity with the
XLA _joint_tiles formulation it replaces on the TPU backend."""

import numpy as np

import jax.numpy as jnp

from ntsm_tpu.eval.pallas_joint import joint_frac_full
from ntsm_tpu.eval.tpu import CHUNK, _joint_tiles


def _xla_full(a, b, v, mc):
    N, Lp = a.shape
    C = Lp // CHUNK
    cs = (N, C, CHUNK)
    a_t = jnp.swapaxes(jnp.asarray(a).reshape(cs), 0, 1)
    b_t = jnp.swapaxes(jnp.asarray(b).reshape(cs), 0, 1)
    v_t = jnp.swapaxes(jnp.asarray(v).reshape(cs), 0, 1)
    fh, fl = _joint_tiles(a_t, b_t, v_t, a_t, b_t, v_t, jnp.float32(mc))
    return np.asarray(fh).astype(np.float64) + np.asarray(fl).astype(
        np.float64
    )


def test_joint_frac_matches_xla(rng):
    N, Lp = 130, 512  # non-multiple of TI exercises the zero-valid padding
    a = rng.integers(0, 40, size=(N, Lp)).astype(np.float32)
    b = rng.integers(0, 40, size=(N, Lp)).astype(np.float32)
    v = (rng.random((N, Lp)) < 0.9).astype(np.float32)
    mc = 1.0

    hi, lo = joint_frac_full(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(v), mc, interpret=True
    )
    got = np.asarray(hi).astype(np.float64) + np.asarray(lo).astype(
        np.float64
    )
    exp = _xla_full(a, b, v, mc)
    err = np.abs(got - exp) / np.maximum(1.0, np.abs(exp))
    assert err.max() < 1e-6


def test_joint_frac_zero_validity_rows(rng):
    """Rows with v == 0 (the padding contract) contribute exactly zero."""
    N, Lp = 128, 256
    a = rng.integers(0, 40, size=(N, Lp)).astype(np.float32)
    b = rng.integers(0, 40, size=(N, Lp)).astype(np.float32)
    v = (rng.random((N, Lp)) < 0.9).astype(np.float32)
    v[5] = 0.0
    hi, lo = joint_frac_full(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(v), 1.0, interpret=True
    )
    got = np.asarray(hi).astype(np.float64) + np.asarray(lo).astype(
        np.float64
    )
    assert np.all(got[5] == 0.0)
    assert np.all(got[:, 5] == 0.0)

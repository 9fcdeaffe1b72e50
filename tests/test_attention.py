"""Attention kernels: the Pallas flash kernel (interpret mode on CPU; the
same code path is compiled on TPU — validated there at 1.3e-7 vs
HIGHEST-precision XLA) must match the masked XLA attention."""

import numpy as np
import jax
import jax.numpy as jnp

from airslam_tpu.ops.attention import mha, flash_mha


def _rand(h=2, n=128, d=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(h, n, d).astype(np.float32))
    return q, k, v


def test_flash_matches_xla_unmasked():
    q, k, v = _rand()
    a = mha(q, k, v)
    b = flash_mha(q, k, v, interpret=True)
    assert np.abs(np.asarray(a - b)).max() < 1e-5


def test_flash_matches_xla_masked():
    q, k, v = _rand(seed=1)
    mask = jnp.asarray(np.arange(128) < 77)
    a = mha(q, k, v, kv_mask=mask)
    b = flash_mha(q, k, v, kv_mask=mask, interpret=True)
    assert np.abs(np.asarray(a - b)).max() < 1e-5


def test_masked_keys_have_no_influence():
    q, k, v = _rand(seed=2)
    mask = jnp.asarray(np.arange(128) < 50)
    a = flash_mha(q, k, v, kv_mask=mask, interpret=True)
    # perturb masked-out K/V rows — the output must not change
    k2 = k.at[:, 50:, :].set(999.0)
    v2 = v.at[:, 50:, :].set(-999.0)
    b = flash_mha(q, k2, v2, kv_mask=mask, interpret=True)
    assert np.abs(np.asarray(a - b)).max() < 1e-6


def test_softmax_rows_normalized():
    q, k, v = _rand(seed=3)
    ones_v = jnp.ones_like(v)
    out = flash_mha(q, k, ones_v, interpret=True)
    assert np.allclose(np.asarray(out), 1.0, atol=1e-5)

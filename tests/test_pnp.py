"""JAX RANSAC PnP: recovery of a known camera pose with outliers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from airslam_tpu.backend.pnp import solve_pnp_ransac
from tests.synthetic import default_intrinsics


def make_case(n=100, n_out=0, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    intr = default_intrinsics()
    Rcw = Rotation.from_rotvec(rng.randn(3) * 0.3).as_matrix()
    tcw = rng.randn(3) * 0.5 + [0, 0, 1.0]
    pw = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 10, n)
    ], -1)
    # ensure points sit in front of THIS camera
    pc = pw @ Rcw.T + tcw
    pw = pw[pc[:, 2] > 0.5]
    pc = pc[pc[:, 2] > 0.5]
    u = pc[:, 0] / pc[:, 2] * 450 + 376
    v = pc[:, 1] / pc[:, 2] * 450 + 240
    uv = np.stack([u, v], -1)
    if noise > 0:
        uv += rng.randn(*uv.shape) * noise
    if n_out:
        idx = rng.choice(len(uv), n_out, replace=False)
        uv[idx] += rng.uniform(80, 300, (n_out, 2)) * np.sign(rng.randn(n_out, 2))
    # pad to fixed budget
    N = 128
    pts_p = np.zeros((N, 3))
    uv_p = np.zeros((N, 2))
    m = np.zeros(N, bool)
    k = min(len(uv), N)
    pts_p[:k] = pw[:k]
    uv_p[:k] = uv[:k]
    m[:k] = True
    return intr, Rcw, tcw, pts_p, uv_p, m, idx if n_out else None


def test_pnp_exact():
    intr, Rcw, tcw, pts, uv, m, _ = make_case()
    R, t, inl, ok = solve_pnp_ransac(
        jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(m), intr,
        jax.random.PRNGKey(0),
    )
    assert bool(ok)
    assert np.abs(np.asarray(t) - tcw).max() < 1e-3
    dR = np.asarray(R).T @ Rcw
    assert np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)) < 1e-3
    assert np.asarray(inl).sum() == m.sum()


def test_pnp_with_outliers_and_noise():
    intr, Rcw, tcw, pts, uv, m, out_idx = make_case(n_out=25, noise=0.5, seed=1)
    R, t, inl, ok = solve_pnp_ransac(
        jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(m), intr,
        jax.random.PRNGKey(1),
    )
    assert bool(ok)
    assert np.abs(np.asarray(t) - tcw).max() < 0.05
    dR = np.asarray(R).T @ Rcw
    assert np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)) < 0.01
    # the gross outliers are excluded
    inl = np.asarray(inl)
    assert not inl[out_idx].any()


def test_pnp_degenerate_too_few_points():
    intr, Rcw, tcw, pts, uv, m, _ = make_case()
    m5 = m & (np.arange(len(m)) < 5)  # fewer than the minimal set
    R, t, inl, ok = solve_pnp_ransac(
        jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(m5), intr,
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(np.asarray(t)).all()  # no NaNs even when degenerate

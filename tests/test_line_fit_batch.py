"""Batched robust line fit (``fit_lines_batch``) vs the scalar oracle.

The round-5 host-budget cut replaced the per-mapline
``fit_line_huber`` + ``extreme_projections`` dispatch pair
(map.cc:416-504 equivalent) with ONE vmapped program per keyframe
(``Map.triangulate_maplines_by_mappoints_batch``). These gates pin the
batch to the scalar path bit-for-bit and check the robust behavior the
map code relies on (outlier rejection, degenerate rejection, padding
invariance).
"""

import numpy as np
import jax.numpy as jnp

from airslam_tpu.backend import triangulate


def _scalar(points, mask):
    cart, inl, ok = triangulate.fit_line_huber(jnp.asarray(points),
                                               jnp.asarray(mask))
    ends = triangulate.extreme_projections(cart, jnp.asarray(points), inl)
    return np.asarray(ends), bool(ok)


def _make_line_points(rng, n, noise=0.01, outliers=0):
    p0 = rng.normal(size=3)
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    t = rng.uniform(-2.0, 2.0, size=n)
    pts = p0 + t[:, None] * d + noise * rng.normal(size=(n, 3))
    if outliers:
        pts[:outliers] += rng.uniform(1.0, 2.0, size=(outliers, 3))
    return pts


def test_batch_matches_scalar_bitexact():
    rng = np.random.default_rng(0)
    P = 64
    B = 8
    buf = np.zeros((B, P, 3))
    mask = np.zeros((B, P), bool)
    for b in range(B):
        n = int(rng.integers(2, P))
        buf[b, :n] = _make_line_points(rng, n, outliers=(n // 8 if b % 2 else 0))
        mask[b, :n] = True
    ends_b, ok_b = triangulate.fit_lines_batch(jnp.asarray(buf),
                                               jnp.asarray(mask))
    ends_b, ok_b = np.asarray(ends_b), np.asarray(ok_b)
    for b in range(B):
        ends_s, ok_s = _scalar(buf[b], mask[b])
        assert bool(ok_b[b]) == ok_s
        if ok_s:
            np.testing.assert_array_equal(ends_b[b], ends_s)


def test_outliers_do_not_move_endpoints():
    rng = np.random.default_rng(1)
    P = 64
    clean = _make_line_points(rng, 40, noise=0.002)
    dirty = clean.copy()
    # 3/40 gross outliers (> inlier_dist=0.1) — recoverable by the 4-round
    # IRLS + reject-refit. (Heavier contamination, e.g. 5/40 at +1.5, tilts
    # the PCA initializer enough that reject-refit drops the true inliers
    # and the fit honestly reports ok=False — same as the scalar oracle.)
    dirty[:3] += 1.0
    buf = np.zeros((2, P, 3))
    buf[0, :40] = clean
    buf[1, :40] = dirty
    mask = np.zeros((2, P), bool)
    mask[:, :40] = True
    ends, ok = triangulate.fit_lines_batch(jnp.asarray(buf), jnp.asarray(mask))
    ends, ok = np.asarray(ends), np.asarray(ok)
    assert ok.all()
    # endpoints from the dirty fit land on the clean fit (outliers rejected)
    assert np.linalg.norm(ends[0] - ends[1]) < 0.01


def test_degenerate_rows_rejected():
    P = 16
    buf = np.zeros((2, P, 3))
    mask = np.zeros((2, P), bool)
    # row 0: a single point (cannot define a line)
    buf[0, 0] = [1.0, 2.0, 3.0]
    mask[0, 0] = True
    # row 1: fully masked-out
    ends, ok = triangulate.fit_lines_batch(jnp.asarray(buf), jnp.asarray(mask))
    assert not np.asarray(ok).any()

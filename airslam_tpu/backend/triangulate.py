"""Triangulation kernels.

- :func:`triangulate_point` — multi-view linear LS from bearing vectors with
  rank check (``Map::TriangulateMappoint``, map.cc:367-414).
- :func:`fit_line_huber` — robust 3D line fit over points with reject-refit
  rounds (``Map::TriangulateMaplineByMappoints``'s cv::fitLine DIST_HUBER +
  4 rounds at 0.1 m, map.cc:416-504), as a fixed-iteration IRLS on masked
  arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def triangulate_point(Rcw, tcw, uv, mask, intr, min_obs: int = 2):
    """Rcw: (N, 3, 3); tcw: (N, 3); uv: (N, 2) pixel observations; mask: (N,).

    Midpoint-style linear system: for each view, the bearing b_i (unit) and
    camera center c_i give two constraint rows (I − b bᵀ)(x − c) = 0.
    Returns (point (3,), ok)."""
    bearings_c = intr.back_project_mono(uv)
    Rwc = jnp.swapaxes(Rcw, -1, -2)
    centers = -jnp.einsum("nij,nj->ni", Rwc, tcw)
    b = jnp.einsum("nij,nj->ni", Rwc, bearings_c)
    b = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)

    eye = jnp.eye(3, dtype=b.dtype)
    P = eye[None] - jnp.einsum("ni,nj->nij", b, b)  # (N, 3, 3)
    P = P * mask[:, None, None]
    A = jnp.sum(P, axis=0)
    rhs = jnp.sum(jnp.einsum("nij,nj->ni", P, centers), axis=0)
    # rank / conditioning check via smallest eigenvalue
    evals = jnp.linalg.eigvalsh(A)
    ok = (jnp.sum(mask) >= min_obs) & (evals[0] > 1e-6)
    x = jnp.linalg.solve(A + (1.0 - ok) * jnp.eye(3, dtype=A.dtype), rhs)
    return x, ok


@jax.jit
def triangulate_points_batch(Rcw, tcw, uv, mask, intr, min_obs: int = 2):
    """Batched :func:`triangulate_point`: all leading args (B, N, …) — one
    compiled program per (B, N) bucket instead of a dispatch per landmark."""
    return jax.vmap(
        lambda R, t, u, m: triangulate_point(R, t, u, m, intr, min_obs)
    )(Rcw, tcw, uv, mask)


@partial(jax.jit, static_argnames=("rounds", "inlier_dist", "huber_delta"))
def fit_line_huber(points, mask, rounds: int = 4, inlier_dist: float = 0.1,
                   huber_delta: float = 0.05):
    """Robust line fit: IRLS around (centroid, principal direction) with
    reject-refit rounds dropping points farther than ``inlier_dist``.

    Returns (cartesian line (6,) = (p0, d), inlier_mask, ok)."""
    m = mask.astype(points.dtype)

    def fit(m_):
        wsum = jnp.clip(jnp.sum(m_), 1e-9)
        mean = jnp.sum(points * m_[:, None], axis=0) / wsum
        centered = (points - mean) * m_[:, None]
        cov = centered.T @ centered / wsum
        evals, evecs = jnp.linalg.eigh(cov)
        d = evecs[:, -1]
        return mean, d

    def dist_to(mean, d):
        rel = points - mean
        proj = rel - jnp.einsum("ni,i->n", rel, d)[:, None] * d
        return jnp.linalg.norm(proj, axis=-1)

    def body(m_, _):
        mean, d = fit(m_)
        dist = dist_to(mean, d)
        w = jnp.where(dist < huber_delta, 1.0, huber_delta / jnp.clip(dist, 1e-9))
        m2 = mask.astype(points.dtype) * w * (dist < inlier_dist)
        return m2, None

    m, _ = jax.lax.scan(body, m, None, length=rounds)
    mean, d = fit(m)
    dist = dist_to(mean, d)
    inliers = mask & (dist < inlier_dist)
    ok = jnp.sum(inliers) >= 2
    return jnp.concatenate([mean, d]), inliers, ok


@jax.jit
def extreme_projections(line_cart, points, mask):
    """Endpoints from extreme projections of inlier points onto the line
    (map.cc endpoint selection). Returns (6,) endpoints."""
    p0, d = line_cart[0:3], line_cart[3:6]
    t = jnp.einsum("ni,i->n", points - p0, d)
    t_min = jnp.min(jnp.where(mask, t, jnp.inf))
    t_max = jnp.max(jnp.where(mask, t, -jnp.inf))
    return jnp.concatenate([p0 + t_min * d, p0 + t_max * d])


@jax.jit
def fit_lines_batch(points, mask):
    """Batched robust line fits: vmapped ``fit_line_huber`` +
    ``extreme_projections`` over a (B, P, 3) point grid.

    One device program per keyframe instead of a dispatch per mapline —
    per-landmark calls cost a device round trip each AND a fresh XLA compile
    for every previously-unseen pad size (measured 376 ms per new bucket on
    CPU; the grid shape here is fixed by the caller's bucketing).
    Returns (endpoints (B, 6), ok (B,))."""

    def one(p, m):
        cart, inliers, ok = fit_line_huber(p, m)
        ends = extreme_projections(cart, p, inliers)
        return ends, ok

    return jax.vmap(one)(points, mask)

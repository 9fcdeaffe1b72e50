"""JAX-native RANSAC PnP.

The reference calls ``cv::solvePnPRansac`` on the host
(``SolvePnPWithCV``, g2o_optimization.cc:1085-1134: 100 iterations, 20 px,
0.99). The pipelines keep that wrapper for exact behavioral parity, but this
module provides a fully device-resident alternative (no OpenCV, no host
round trip) built TPU-first:

- all H hypotheses are solved in parallel with ``vmap`` (fixed H = 128);
- the minimal solver is a 6-point DLT (SVD of the 2n×12 system) with
  orthogonal Procrustes projection of the rotation block onto SO(3);
- inliers are counted against the reference's 20 px reprojection gate;
- the best hypothesis is refined by a few Gauss-Newton steps on its inliers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from airslam_tpu.core import lie


def _dlt_pose(points, uv_norm, sel):
    """Minimal DLT: points (N, 3), uv_norm (N, 2) normalized image coords,
    sel (S,) int32 indices of the minimal set. Returns (Rcw, tcw)."""
    p = points[sel]
    u = uv_norm[sel]
    s = sel.shape[0]
    zeros = jnp.zeros((s, 4), p.dtype)
    ph = jnp.concatenate([p, jnp.ones((s, 1), p.dtype)], axis=1)  # (S, 4)
    rows_u = jnp.concatenate([ph, zeros, -u[:, 0:1] * ph], axis=1)  # (S, 12)
    rows_v = jnp.concatenate([zeros, ph, -u[:, 1:2] * ph], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2S, 12)
    # null vector = right singular vector of least singular value
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[-1].reshape(3, 4)
    R_raw = h[:, :3]
    # scale + chirality: ||rows|| ≈ s, depth positive for the first point
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(R_raw)))
    scale = jnp.where(scale < 1e-12, 1.0, scale)
    h = h / scale
    depth0 = h[2] @ jnp.concatenate([p[0], jnp.ones(1, p.dtype)])
    h = h * jnp.where(depth0 < 0, -1.0, 1.0)
    R = lie.normalize_rotation(h[:, :3])
    t = h[:, 3]
    return R, t


def _reproj_errors(R, t, points, uv, intr):
    pc = points @ R.T + t
    z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
    u = pc[:, 0] / z * intr.fx + intr.cx
    v = pc[:, 1] / z * intr.fy + intr.cy
    err = jnp.sqrt((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2)
    return jnp.where(pc[:, 2] > 0, err, jnp.full_like(err, 1e9))


@functools.partial(jax.jit, static_argnames=("iterations", "refine_steps"))
def solve_pnp_ransac(
    points,  # (N, 3) world points (padded)
    uv,  # (N, 2) pixel observations
    mask,  # (N,) validity
    intr,
    key,  # PRNG key
    iterations: int = 128,
    reproj_thr: float = 20.0,  # px, matching the reference's RANSAC gate
    refine_steps: int = 5,
):
    """Returns (Rcw, tcw, inliers (N,) bool, ok)."""
    n = points.shape[0]
    dtype = points.dtype
    uv_norm = jnp.stack(
        [(uv[:, 0] - intr.cx) / intr.fx, (uv[:, 1] - intr.cy) / intr.fy], axis=1
    )

    # weighted minimal-set sampling over valid entries
    logits = jnp.where(mask, 0.0, -1e9)
    keys = jax.random.split(key, iterations)

    def hypothesis(k):
        sel = jax.random.categorical(k, logits, shape=(6,))
        R, t = _dlt_pose(points, uv_norm, sel)
        errs = _reproj_errors(R, t, points, uv, intr)
        inl = (errs < reproj_thr) & mask
        return R, t, jnp.sum(inl)

    Rs, ts, scores = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    R, t = Rs[best], ts[best]
    ok = scores[best] >= 6

    # Gauss-Newton refinement on the best hypothesis' inliers
    def gn_step(carry, _):
        R, t = carry

        def resid(delta):
            dR = lie.so3_exp(delta[0:3])
            R2 = dR @ R
            t2 = t + delta[3:6]
            pc = points @ R2.T + t2
            z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
            u = pc[:, 0] / z * intr.fx + intr.cx
            v = pc[:, 1] / z * intr.fy + intr.cy
            r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], axis=1)
            w = ((_reproj_errors(R, t, points, uv, intr) < reproj_thr) & mask)
            return (r * w[:, None].astype(dtype)).reshape(-1)

        J = jax.jacfwd(resid)(jnp.zeros(6, dtype))
        r = resid(jnp.zeros(6, dtype))
        H = J.T @ J + 1e-6 * jnp.eye(6, dtype=dtype)
        dx = jnp.linalg.solve(H, -J.T @ r)
        R2 = lie.so3_exp(dx[0:3]) @ R
        t2 = t + dx[3:6]
        return (R2, t2), None

    (R, t), _ = jax.lax.scan(gn_step, (R, t), None, length=refine_steps)
    inliers = (_reproj_errors(R, t, points, uv, intr) < reproj_thr) & mask
    return R, t, inliers, ok & (jnp.sum(inliers) >= 6)

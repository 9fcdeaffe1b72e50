"""SO(3)/SE(3)/Plücker-line Lie operations, batched and jit-able.

Conventions follow the reference system (sair-lab/AirSLAM):

- ``so3_exp`` / ``so3_log`` / right Jacobian: Rodrigues with the same small-angle
  branches as ``SO3Exp``/``SO3Log``/``ComputerDeltaR`` in ``src/imu.cc:26-67``.
- ``normalize_rotation``: SVD projection onto SO(3) (``src/imu.cc:16-19``).
- Plücker 3D lines are stored as 6-vectors ``(w, d)`` with ``w`` the moment
  (``p × d`` for any point ``p`` on the line) and ``d`` the direction, matching
  ``g2o::Line3D`` as used by ``src/line_processor.cc:257-326`` and the line
  projection in ``src/g2o_optimization/edge_project_line.cc:37-46``.
- The 4-dof orthonormal line update (Bartoli–Sturm) matches the tangent-space
  convention of ``VertexLine3D::oplusImpl`` (``include/g2o_optimization/vertex_line3d.h:22-26``).

All functions broadcast over leading batch dimensions and preserve input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-4  # IMU_EPS in include/imu.h:20


def hat(v: jax.Array) -> jax.Array:
    """(…, 3) -> (…, 3, 3) skew-symmetric matrix. Reference: src/imu.cc:12-14."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jax.Array) -> jax.Array:
    """(…, 3, 3) skew -> (…, 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(v: jax.Array) -> jax.Array:
    """Rodrigues exponential map, (…, 3) -> (…, 3, 3).

    Same series switch as ``SO3Exp`` (src/imu.cc:40-55) at theta < 1e-4, but
    without the SVD renormalization (callers that need the reference's exact
    behavior compose with :func:`normalize_rotation`).
    """
    theta2 = jnp.sum(v * v, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _EPS
    # Guarded denominators (branchless for TPU).
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    safe_theta2 = safe_theta * safe_theta
    a = jnp.where(small, jnp.ones_like(theta), jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(small, 0.5 * jnp.ones_like(theta), (1.0 - jnp.cos(safe_theta)) / safe_theta2)
    omega = hat(v)
    omega2 = omega @ omega
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), omega.shape)
    return eye + a[..., None, None] * omega + b[..., None, None] * omega2


def so3_log(r: jax.Array) -> jax.Array:
    """(…, 3, 3) -> (…, 3). Same branch structure as ``SO3Log`` (src/imu.cc:57-67)."""
    d = 0.5 * (r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2] - 1.0)
    delta_r = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    near_identity = jnp.abs(d) > 0.99999
    d_clip = jnp.clip(d, -1.0 + 1e-12, 1.0 - 1e-12)
    theta = jnp.arccos(d_clip)
    scale = theta / (2.0 * jnp.sqrt(1.0 - d_clip * d_clip))
    scale = jnp.where(near_identity, 0.5 * jnp.ones_like(scale), scale)
    return scale[..., None] * delta_r


def so3_right_jacobian(v: jax.Array) -> jax.Array:
    """Right Jacobian of SO(3) exp, as in ``ComputerDeltaR`` (src/imu.cc:21-33)."""
    theta2 = jnp.sum(v * v, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _EPS
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    safe_theta2 = safe_theta * safe_theta
    a = jnp.where(small, jnp.zeros_like(theta), (1.0 - jnp.cos(safe_theta)) / safe_theta2)
    b = jnp.where(
        small, jnp.zeros_like(theta), (safe_theta - jnp.sin(safe_theta)) / (safe_theta2 * safe_theta)
    )
    omega = hat(v)
    omega2 = omega @ omega
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), omega.shape)
    return eye - a[..., None, None] * omega + b[..., None, None] * omega2


def so3_right_jacobian_inv(v: jax.Array) -> jax.Array:
    """Inverse right Jacobian (used by the IMU rotation residual Jacobians)."""
    theta2 = jnp.sum(v * v, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _EPS
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    safe_theta2 = safe_theta * safe_theta
    coef = jnp.where(
        small,
        jnp.zeros_like(theta),
        1.0 / safe_theta2 - (1.0 + jnp.cos(safe_theta)) / (2.0 * safe_theta * jnp.sin(safe_theta)),
    )
    omega = hat(v)
    omega2 = omega @ omega
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), omega.shape)
    return eye + 0.5 * omega + coef[..., None, None] * omega2


def normalize_rotation(r: jax.Array) -> jax.Array:
    """Project (…, 3, 3) onto SO(3) via SVD — ``NormalizeRotation`` src/imu.cc:16-19."""
    u, _, vt = jnp.linalg.svd(r)
    det = jnp.linalg.det(u @ vt)
    # Guard against reflections (det=-1) for robustness; the reference assumes det>0.
    u_fixed = u.at[..., :, -1].multiply(jnp.sign(det)[..., None])
    return u_fixed @ vt


# ---------------------------------------------------------------------------
# SE(3) as (R, t) pairs and 4x4 homogeneous matrices
# ---------------------------------------------------------------------------


def se3_matrix(r: jax.Array, t: jax.Array) -> jax.Array:
    """(…,3,3),(…,3) -> (…,4,4)."""
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    r = jnp.broadcast_to(r, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=r.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(r: jax.Array, t: jax.Array):
    rt = jnp.swapaxes(r, -1, -2)
    return rt, -jnp.einsum("...ij,...j->...i", rt, t)


def se3_compose(r1, t1, r2, t2):
    """(R1,t1)·(R2,t2): apply T2 first."""
    return r1 @ r2, jnp.einsum("...ij,...j->...i", r1, t2) + t1


def se3_apply(r, t, p):
    return jnp.einsum("...ij,...j->...i", r, p) + t


def quat_to_rot(q: jax.Array) -> jax.Array:
    """(…, 4) quaternion (w, x, y, z) -> (…, 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(r: jax.Array) -> jax.Array:
    """(…, 3, 3) -> (…, 4) quaternion (w, x, y, z), branchless Shepperd-style."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22
    qw = 0.5 * jnp.sqrt(jnp.clip(1.0 + tr, 1e-12))
    qx = 0.5 * jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12))
    qy = 0.5 * jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12))
    qz = 0.5 * jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12))
    qx = qx * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
    qy = qy * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
    qz = qz * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Plücker lines: 6-vectors (w, d); w = moment, d = direction (g2o::Line3D layout)
# ---------------------------------------------------------------------------


def line_from_endpoints(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Two 3D points -> normalized Plücker (w, d) with |d| = 1.

    Mirrors ``ComputeLine3DFromEndpoints`` (src/line_processor.cc:312-326):
    direction p2-p1, moment p1 × d.
    """
    d = p2 - p1
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    w = jnp.cross(p1, dn)
    return jnp.concatenate([w, dn], axis=-1)


def line_normalize(line: jax.Array) -> jax.Array:
    """Scale so |d| = 1 (g2o ``Line3D::normalize``)."""
    d = line[..., 3:6]
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return line / jnp.clip(n, 1e-12)


def line_transform(r: jax.Array, t: jax.Array, line: jax.Array) -> jax.Array:
    """Apply SE(3) (R, t) to a Plücker line: w' = R w + t × (R d); d' = R d.

    This is the g2o ``Isometry3 * Line3D`` action used e.g. at
    src/line_processor.cc:305 and edge_project_line.cc:28.
    """
    w = jnp.einsum("...ij,...j->...i", r, line[..., 0:3])
    d = jnp.einsum("...ij,...j->...i", r, line[..., 3:6])
    w = w + jnp.cross(jnp.broadcast_to(t, d.shape), d)
    return jnp.concatenate([w, d], axis=-1)


def line_to_cartesian(line: jax.Array) -> jax.Array:
    """(w, d) -> (p0, d) with p0 the point on the line closest to the origin."""
    line = line_normalize(line)
    w, d = line[..., 0:3], line[..., 3:6]
    p0 = jnp.cross(d, w)
    return jnp.concatenate([p0, d], axis=-1)


def line_orthonormal_oplus(line: jax.Array, update: jax.Array) -> jax.Array:
    """4-dof orthonormal (Bartoli–Sturm) update of a Plücker line.

    ``update`` = (…, 4): first 3 rotate the U ∈ SO(3) frame (right multiply),
    last 1 rotates the W ∈ SO(2) factor carrying the w/d magnitude ratio.
    Tangent convention of ``VertexLine3D::oplusImpl``
    (include/g2o_optimization/vertex_line3d.h:22-26). Returns a line with |d|=1.
    """
    w, d = line[..., 0:3], line[..., 3:6]
    nw = jnp.linalg.norm(w, axis=-1)
    nd = jnp.linalg.norm(d, axis=-1)
    n = jnp.sqrt(nw * nw + nd * nd)
    u1 = w / jnp.clip(nw, 1e-12)[..., None]
    u2 = d / jnp.clip(nd, 1e-12)[..., None]
    u3 = jnp.cross(u1, u2)
    u = jnp.stack([u1, u2, u3], axis=-1)  # columns
    cos_phi = nw / jnp.clip(n, 1e-12)
    sin_phi = nd / jnp.clip(n, 1e-12)

    du = so3_exp(update[..., 0:3])
    u_new = u @ du
    dphi = update[..., 3]
    cos_new = cos_phi * jnp.cos(dphi) - sin_phi * jnp.sin(dphi)
    sin_new = sin_phi * jnp.cos(dphi) + cos_phi * jnp.sin(dphi)

    w_new = cos_new[..., None] * u_new[..., :, 0]
    d_new = sin_new[..., None] * u_new[..., :, 1]
    return line_normalize(jnp.concatenate([w_new, d_new], axis=-1))


def line_point_distance(line: jax.Array, p: jax.Array) -> jax.Array:
    """Euclidean distance of a 3D point to a normalized Plücker line."""
    line = line_normalize(line)
    w, d = line[..., 0:3], line[..., 3:6]
    return jnp.linalg.norm(jnp.cross(p, d) - w, axis=-1)

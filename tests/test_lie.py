import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from airslam_tpu.core import lie


def rand_rot(rng):
    return Rotation.random(random_state=rng).as_matrix()


def test_hat_vee_roundtrip():
    v = jnp.asarray([1.0, -2.0, 3.0])
    m = lie.hat(v)
    assert np.allclose(m, -m.T)
    assert np.allclose(lie.vee(m), v)


def test_so3_exp_matches_scipy():
    rng = np.random.RandomState(0)
    vs = rng.randn(32, 3)
    ours = np.asarray(lie.so3_exp(jnp.asarray(vs)))
    ref = Rotation.from_rotvec(vs).as_matrix()
    assert np.allclose(ours, ref, atol=1e-9)


def test_so3_exp_small_angle():
    v = jnp.asarray([1e-6, -2e-6, 1e-7])
    r = lie.so3_exp(v)
    ref = Rotation.from_rotvec(np.array(v)).as_matrix()
    assert np.allclose(r, ref, atol=1e-12)


def test_so3_log_roundtrip():
    rng = np.random.RandomState(1)
    vs = rng.randn(16, 3) * 0.9  # keep |v| < pi
    rs = lie.so3_exp(jnp.asarray(vs))
    back = np.asarray(lie.so3_log(rs))
    assert np.allclose(back, vs, atol=1e-7)


def test_so3_log_near_identity():
    v = np.array([1e-8, 2e-8, -1e-8])
    r = Rotation.from_rotvec(v).as_matrix()
    assert np.allclose(lie.so3_log(jnp.asarray(r)), v, atol=1e-12)


def test_right_jacobian_finite_diff():
    rng = np.random.RandomState(2)
    v = rng.randn(3) * 0.5
    jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(v)))
    # exp(v + dv) ≈ exp(v) exp(Jr dv)
    eps = 1e-6
    for k in range(3):
        dv = np.zeros(3)
        dv[k] = eps
        lhs = Rotation.from_rotvec(v + dv).as_matrix()
        rhs = Rotation.from_rotvec(v).as_matrix() @ Rotation.from_rotvec(jr @ dv).as_matrix()
        assert np.allclose(lhs, rhs, atol=1e-9)


def test_right_jacobian_inverse():
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.randn(3))
    jr = lie.so3_right_jacobian(v)
    jri = lie.so3_right_jacobian_inv(v)
    assert np.allclose(jr @ jri, np.eye(3), atol=1e-8)


def test_normalize_rotation():
    rng = np.random.RandomState(4)
    r = rand_rot(rng) + 0.01 * rng.randn(3, 3)
    rn = np.asarray(lie.normalize_rotation(jnp.asarray(r)))
    assert np.allclose(rn @ rn.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(rn) > 0.99


def test_se3_compose_inverse():
    rng = np.random.RandomState(5)
    r1, t1 = rand_rot(rng), rng.randn(3)
    r2, t2 = rand_rot(rng), rng.randn(3)
    rc, tc = lie.se3_compose(jnp.asarray(r1), jnp.asarray(t1), jnp.asarray(r2), jnp.asarray(t2))
    m = np.eye(4)
    m[:3, :3], m[:3, 3] = r1, t1
    m2 = np.eye(4)
    m2[:3, :3], m2[:3, 3] = r2, t2
    ref = m @ m2
    assert np.allclose(rc, ref[:3, :3], atol=1e-12)
    assert np.allclose(tc, ref[:3, 3], atol=1e-12)
    ri, ti = lie.se3_inverse(jnp.asarray(r1), jnp.asarray(t1))
    refinv = np.linalg.inv(m)
    assert np.allclose(ri, refinv[:3, :3], atol=1e-12)
    assert np.allclose(ti, refinv[:3, 3], atol=1e-12)


def test_quat_roundtrip():
    rng = np.random.RandomState(6)
    r = rand_rot(rng)
    q = lie.rot_to_quat(jnp.asarray(r))
    r2 = lie.quat_to_rot(q)
    assert np.allclose(r, r2, atol=1e-10)


# -- Plücker lines ----------------------------------------------------------


def test_line_from_endpoints_moment_orthogonal():
    p1 = jnp.asarray([1.0, 0.0, 2.0])
    p2 = jnp.asarray([2.0, 1.0, 3.0])
    line = lie.line_from_endpoints(p1, p2)
    w, d = np.asarray(line[:3]), np.asarray(line[3:])
    assert abs(np.dot(w, d)) < 1e-12
    assert np.allclose(np.linalg.norm(d), 1.0)
    # both endpoints lie on the line
    assert float(lie.line_point_distance(line, p1)) < 1e-10
    assert float(lie.line_point_distance(line, p2)) < 1e-10


def test_line_transform_consistency():
    """Transforming the line == transforming its points."""
    rng = np.random.RandomState(7)
    p1, p2 = rng.randn(3), rng.randn(3) + 2.0
    r, t = rand_rot(rng), rng.randn(3)
    line = lie.line_from_endpoints(jnp.asarray(p1), jnp.asarray(p2))
    moved = lie.line_transform(jnp.asarray(r), jnp.asarray(t), line)
    q1, q2 = r @ p1 + t, r @ p2 + t
    expect = lie.line_from_endpoints(jnp.asarray(q1), jnp.asarray(q2))
    # lines equal up to sign/scale — compare normalized with sign fix
    a = np.asarray(lie.line_normalize(moved))
    b = np.asarray(lie.line_normalize(expect))
    if np.dot(a[3:], b[3:]) < 0:
        b = -b
    assert np.allclose(a, b, atol=1e-9)


def test_line_to_cartesian():
    p1 = jnp.asarray([0.0, 1.0, 5.0])
    p2 = jnp.asarray([0.0, 1.0, 9.0])  # line parallel to z through (0,1,·)
    line = lie.line_from_endpoints(p1, p2)
    cart = np.asarray(lie.line_to_cartesian(line))
    p0, d = cart[:3], cart[3:]
    assert np.allclose(p0, [0.0, 1.0, 0.0], atol=1e-12)  # closest point to origin
    assert np.allclose(np.abs(d), [0, 0, 1], atol=1e-12)


def test_line_oplus_zero_is_identity():
    line = lie.line_from_endpoints(jnp.asarray([1.0, 2.0, 3.0]), jnp.asarray([0.0, 1.0, 1.0]))
    out = lie.line_orthonormal_oplus(line, jnp.zeros(4))
    a, b = np.asarray(lie.line_normalize(line)), np.asarray(out)
    assert np.allclose(a, b, atol=1e-10)


def test_line_oplus_preserves_plucker_constraint():
    rng = np.random.RandomState(8)
    line = lie.line_from_endpoints(jnp.asarray(rng.randn(3)), jnp.asarray(rng.randn(3)))
    for _ in range(5):
        upd = jnp.asarray(rng.randn(4) * 0.3)
        line = lie.line_orthonormal_oplus(line, upd)
        w, d = np.asarray(line[:3]), np.asarray(line[3:])
        assert abs(np.dot(w, d)) < 1e-10
        assert np.allclose(np.linalg.norm(d), 1.0, atol=1e-10)


def test_line_oplus_4dof_spans_neighborhood():
    """Small updates move the line smoothly; ratio dof changes |w|/|d|."""
    line = lie.line_from_endpoints(jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 0.0]))
    base_dist = float(lie.line_point_distance(line, jnp.asarray([0.0, 0.0, 0.0])))
    out = lie.line_orthonormal_oplus(line, jnp.asarray([0.0, 0.0, 0.0, 0.1]))
    new_dist = float(lie.line_point_distance(out, jnp.asarray([0.0, 0.0, 0.0])))
    assert abs(new_dist - base_dist) > 1e-4  # distance-to-origin dof moved

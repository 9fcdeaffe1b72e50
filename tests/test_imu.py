"""IMU preintegration golden tests against an independent numpy oracle
implementing the Forster et al. on-manifold preintegration equations
(the same math as the reference's src/imu.cc)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from airslam_tpu.core import imu as jimu


def np_hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def np_right_jac(v):
    d = np.linalg.norm(v)
    vh = np_hat(v)
    if d < 1e-4:
        return np.eye(3)
    return np.eye(3) - (1 - np.cos(d)) / d**2 * vh + (d - np.sin(d)) / d**3 * vh @ vh


class NumpyPreint:
    """Oracle: direct transcription of the preintegration recursion."""

    def __init__(self, bg, ba, gn, an, gw, aw):
        self.bg, self.ba = np.asarray(bg), np.asarray(ba)
        self.noise = np.diag([gn**2] * 3 + [an**2] * 3)
        self.walk = np.diag([gw**2] * 3 + [aw**2] * 3)
        self.dT = 0.0
        self.dR = np.eye(3)
        self.dV = np.zeros(3)
        self.dP = np.zeros(3)
        self.JRg = np.zeros((3, 3))
        self.JVg = np.zeros((3, 3))
        self.JVa = np.zeros((3, 3))
        self.JPg = np.zeros((3, 3))
        self.JPa = np.zeros((3, 3))
        self.Cov = np.zeros((15, 15))

    def step(self, dt, acc_m, gyr_m):
        acc = acc_m - self.ba
        gyr = gyr_m - self.bg
        self.dP = self.dP + self.dV * dt + 0.5 * self.dR @ acc * dt * dt
        self.dV = self.dV + self.dR @ acc * dt
        ah = np_hat(acc)
        A = np.eye(9)
        B = np.zeros((9, 6))
        A[3:6, 0:3] = -self.dR * dt @ ah
        A[6:9, 0:3] = -0.5 * self.dR * dt * dt @ ah
        A[6:9, 3:6] = np.eye(3) * dt
        B[3:6, 3:6] = self.dR * dt
        B[6:9, 3:6] = 0.5 * self.dR * dt * dt
        self.JPa = self.JPa + self.JVa * dt - 0.5 * self.dR * dt * dt
        self.JPg = self.JPg + self.JVg * dt - 0.5 * self.dR * dt * dt @ ah @ self.JRg
        self.JVa = self.JVa - self.dR * dt
        self.JVg = self.JVg - self.dR * dt @ ah @ self.JRg
        rv = gyr * dt
        dRk = Rotation.from_rotvec(rv).as_matrix()
        Jr = np_right_jac(rv)
        self.dR = self.dR @ dRk
        A[0:3, 0:3] = dRk.T
        B[0:3, 0:3] = Jr * dt
        self.Cov[0:9, 0:9] = A @ self.Cov[0:9, 0:9] @ A.T + B @ self.noise @ B.T
        self.Cov[9:15, 9:15] += self.walk
        self.JRg = dRk.T @ self.JRg - Jr * dt
        self.dT += dt


def make_measurements(n=50, seed=0):
    rng = np.random.RandomState(seed)
    dts = np.full(n, 0.005) + rng.rand(n) * 1e-4
    gyrs = rng.randn(n, 3) * 0.2
    accs = rng.randn(n, 3) * 0.5 + np.array([0, 0, 9.81])
    return dts, accs, gyrs


def test_preintegration_matches_oracle():
    dts, accs, gyrs = make_measurements()
    bg = np.array([0.01, -0.02, 0.005])
    ba = np.array([0.05, 0.02, -0.1])
    gn, an, gw, aw = 1.7e-4 * np.sqrt(200), 2e-3 * np.sqrt(200), 1.9e-5 / np.sqrt(200), 3e-3 / np.sqrt(200)

    oracle = NumpyPreint(bg, ba, gn, an, gw, aw)
    for dt, a, g in zip(dts, accs, gyrs):
        oracle.step(dt, a, g)

    st = jimu.preintegrate(
        jnp.asarray(dts),
        jnp.asarray(accs),
        jnp.asarray(gyrs),
        jnp.asarray(bg),
        jnp.asarray(ba),
        jnp.asarray([gn**2] * 3 + [an**2] * 3),
        jnp.asarray([gw**2] * 3 + [aw**2] * 3),
    )
    assert np.allclose(float(st.dT), oracle.dT, atol=1e-12)
    assert np.allclose(np.asarray(st.dR), oracle.dR, atol=1e-8)
    assert np.allclose(np.asarray(st.dV), oracle.dV, atol=1e-8)
    assert np.allclose(np.asarray(st.dP), oracle.dP, atol=1e-8)
    assert np.allclose(np.asarray(st.JRg), oracle.JRg, atol=1e-8)
    assert np.allclose(np.asarray(st.JVg), oracle.JVg, atol=1e-8)
    assert np.allclose(np.asarray(st.JVa), oracle.JVa, atol=1e-8)
    assert np.allclose(np.asarray(st.JPg), oracle.JPg, atol=1e-8)
    assert np.allclose(np.asarray(st.JPa), oracle.JPa, atol=1e-8)
    assert np.allclose(np.asarray(st.cov), oracle.Cov, rtol=1e-6, atol=1e-14)


def test_padding_is_noop():
    dts, accs, gyrs = make_measurements(20, seed=1)
    bg = np.zeros(3)
    ba = np.zeros(3)
    args = (jnp.zeros(3), jnp.zeros(3), jnp.ones(6) * 1e-6, jnp.ones(6) * 1e-8)
    st1 = jimu.preintegrate(jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs), *args)
    # pad with 12 zero-dt rows
    dts_p = np.concatenate([dts, np.zeros(12)])
    accs_p = np.concatenate([accs, np.ones((12, 3)) * 99])
    gyrs_p = np.concatenate([gyrs, np.ones((12, 3)) * -99])
    st2 = jimu.preintegrate(jnp.asarray(dts_p), jnp.asarray(accs_p), jnp.asarray(gyrs_p), *args)
    for a, b in zip(st1, st2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-14)


def test_bias_corrected_deltas_match_repropagation():
    """First-order bias correction should approximate full repropagation."""
    dts, accs, gyrs = make_measurements(40, seed=2)
    bg0, ba0 = np.zeros(3), np.zeros(3)
    dbg = np.array([5e-4, -3e-4, 2e-4])
    dba = np.array([2e-3, 1e-3, -2e-3])
    noise = jnp.ones(6) * 1e-6
    walk = jnp.ones(6) * 1e-9

    st = jimu.preintegrate(
        jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
        jnp.asarray(bg0), jnp.asarray(ba0), noise, walk,
    )
    # full repropagation at the new bias
    st_new = jimu.preintegrate(
        jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
        jnp.asarray(bg0 + dbg), jnp.asarray(ba0 + dba), noise, walk,
    )
    dR_corr = jimu.delta_rotation(st, jnp.asarray(bg0), jnp.asarray(bg0 + dbg))
    dV_corr = jimu.delta_velocity(st, jnp.asarray(bg0), jnp.asarray(ba0), jnp.asarray(bg0 + dbg), jnp.asarray(ba0 + dba))
    dP_corr = jimu.delta_position(st, jnp.asarray(bg0), jnp.asarray(ba0), jnp.asarray(bg0 + dbg), jnp.asarray(ba0 + dba))
    assert np.allclose(np.asarray(dR_corr), np.asarray(st_new.dR), atol=1e-6)
    assert np.allclose(np.asarray(dV_corr), np.asarray(st_new.dV), atol=1e-5)
    assert np.allclose(np.asarray(dP_corr), np.asarray(st_new.dP), atol=1e-5)


def test_midpoint_batch_interpolation():
    data = [
        jimu.ImuData(0.00, np.array([1.0, 0, 0]), np.array([0, 0, 9.8])),
        jimu.ImuData(0.01, np.array([2.0, 0, 0]), np.array([0, 0, 9.8])),
        jimu.ImuData(0.02, np.array([3.0, 0, 0]), np.array([0, 0, 9.8])),
    ]
    # interval fully covering both gaps
    dts, accs, gyrs = jimu.midpoint_batch(data, 0.0, 0.02)
    assert np.allclose(dts, [0.01, 0.01])
    assert np.allclose(gyrs[:, 0], [1.5, 2.5])  # midpoint interpolation
    # partial interval: t0 inside first gap
    dts, accs, gyrs = jimu.midpoint_batch(data, 0.005, 0.02)
    assert np.allclose(dts, [0.005, 0.01])
    # first row midpoint t = (0.005+0.01)/2 = 0.0075 → gyr = 1.75
    assert np.allclose(gyrs[0, 0], 1.75)


def test_predict_constant_velocity():
    """Zero acc (minus gravity), zero gyr → pure gravity-compensated motion."""
    n = 100
    dts = np.full(n, 0.005)
    accs = np.tile(np.array([0, 0, 9.81]), (n, 1))  # measures -gravity at rest
    gyrs = np.zeros((n, 3))
    pre = jimu.Preintegration(noise=(1e-4, 1e-3, 1e-5, 1e-4))
    pre._rows_dt = dts.tolist()
    pre._rows_acc = list(accs)
    pre._rows_gyr = list(gyrs)
    pre.start_time, pre.end_time = 0.0, 0.5
    Twb0 = np.eye(4)
    v0 = np.array([1.0, 0.0, 0.0])
    Twb1, v1 = pre.predict(Twb0, v0, 9.81)
    assert np.allclose(Twb1[:3, :3], np.eye(3), atol=1e-9)
    assert np.allclose(Twb1[:3, 3], [0.5, 0, 0], atol=1e-6)
    assert np.allclose(v1, v0, atol=1e-6)

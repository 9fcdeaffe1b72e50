"""Synthetic scene generation shared by backend tests and demos."""

import jax
import numpy as np
import jax.numpy as jnp

from airslam_tpu.backend import gn
from airslam_tpu.core.camera import Intrinsics


def _default_dtype():
    """f64 when x64 is enabled (the test suite), f32 otherwise (the driver's
    multichip dryrun) — unconditional f64 emits truncation warnings there."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_intrinsics(dtype=None):
    dtype = dtype or _default_dtype()
    return Intrinsics(
        fx=jnp.asarray(450.0, dtype), fy=jnp.asarray(450.0, dtype),
        cx=jnp.asarray(376.0, dtype), cy=jnp.asarray(240.0, dtype),
        bf=jnp.asarray(45.0, dtype), width=752, height=480,
    )


def random_trajectory(f, rng, step=0.3):
    """Forward-moving camera with small rotations. Returns (F,3,3), (F,3)."""
    from scipy.spatial.transform import Rotation

    Rwb = np.zeros((f, 3, 3))
    twb = np.zeros((f, 3))
    R = np.eye(3)
    t = np.zeros(3)
    for i in range(f):
        Rwb[i] = R
        twb[i] = t
        R = R @ Rotation.from_rotvec(rng.randn(3) * 0.02).as_matrix()
        t = t + R @ np.array([step, 0, 0.05 * rng.randn()])
    return Rwb, twb


def make_point_scene(
    f=3, p=40, rng=None, noise_px=0.0, stereo=True,
    Rcb=None, tcb=None, point_range=((-3, 3), (-2, 2), (4, 10)),
):
    """Ground-truth scene + observation grid. Points are generated in front of
    the cameras (camera z forward via Rcb)."""
    rng = rng or np.random.RandomState(0)
    if Rcb is None:
        Rcb = np.eye(3)
        tcb = np.zeros(3)
    intr = default_intrinsics()
    Rwb, twb = random_trajectory(f, rng)

    (x0, x1), (y0, y1), (z0, z1) = point_range
    pts = np.stack(
        [
            rng.uniform(x0, x1, p) + np.mean(twb[:, 0]),
            rng.uniform(y0, y1, p),
            rng.uniform(z0, z1, p),
        ],
        axis=-1,
    )
    # world points: place them in front of the average camera; cameras look +z
    obs = np.zeros((p, f, 3))
    mask = np.zeros((p, f), bool)
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy = float(intr.cx), float(intr.cy)
    bf = float(intr.bf)
    for i in range(f):
        Rcw = Rcb @ Rwb[i].T
        tcw = tcb - Rcw @ twb[i]
        pc = pts @ Rcw.T + tcw
        z = pc[:, 2]
        u = pc[:, 0] / z * fx + cx
        v = pc[:, 1] / z * fy + cy
        ur = u - bf / z
        ok = (z > 0.2) & (u >= 0) & (u < 752) & (v >= 0) & (v < 480)
        if noise_px > 0:
            u = u + rng.randn(p) * noise_px
            v = v + rng.randn(p) * noise_px
            ur = ur + rng.randn(p) * noise_px
        obs[:, i, 0] = u
        obs[:, i, 1] = v
        obs[:, i, 2] = ur if stereo else -1.0
        mask[:, i] = ok
    return dict(Rwb=Rwb, twb=twb, points=pts, obs=obs, mask=mask, intr=intr,
                Rcb=Rcb, tcb=tcb)


def build_problem(
    scene, Rwb=None, twb=None, points=None,
    pose_fixed=None, point_fixed=None, lines=None, line_obs=None,
    line_obs_mask=None, line_obs_stereo=None, line_fixed=None, imu=None,
    dtype=None,
):
    dtype = dtype or _default_dtype()
    f = scene["Rwb"].shape[0]
    p = scene["points"].shape[0]
    Rwb = scene["Rwb"] if Rwb is None else Rwb
    twb = scene["twb"] if twb is None else twb
    points = scene["points"] if points is None else points
    if pose_fixed is None:
        pose_fixed = np.zeros(f, bool)
        pose_fixed[0] = True
    if point_fixed is None:
        point_fixed = np.zeros(p, bool)
    L = 1 if lines is None else lines.shape[0]
    frames = gn.FrameStates(
        Rwb=jnp.asarray(Rwb, dtype), twb=jnp.asarray(twb, dtype),
        vel=jnp.zeros((f, 3), dtype), bg=jnp.zeros((f, 3), dtype),
        ba=jnp.zeros((f, 3), dtype),
    )
    return gn.BAProblem(
        frames=frames,
        pose_fixed=jnp.asarray(pose_fixed),
        vel_fixed=jnp.ones((f,), bool),
        points=jnp.asarray(points, dtype),
        point_fixed=jnp.asarray(point_fixed),
        point_obs=jnp.asarray(scene["obs"], dtype),
        point_obs_mask=jnp.asarray(scene["mask"]),
        lines=jnp.asarray(lines, dtype) if lines is not None else jnp.tile(
            jnp.asarray([1.0, 0, 0, 0, 1.0, 0], dtype), (L, 1)
        ),
        line_fixed=jnp.ones((L,), bool) if line_fixed is None else jnp.asarray(line_fixed),
        line_obs=jnp.zeros((L, f, 8), dtype) if line_obs is None else jnp.asarray(line_obs, dtype),
        line_obs_stereo=jnp.zeros((L, f), bool) if line_obs_stereo is None else jnp.asarray(line_obs_stereo),
        line_obs_mask=jnp.zeros((L, f), bool) if line_obs_mask is None else jnp.asarray(line_obs_mask),
        line_obs_sigma=jnp.full((L, f), 1.0, dtype),
        Rwg=jnp.eye(3, dtype=dtype),
        gravity_free=jnp.asarray(0.0),
        imu=imu,
        Rcb=jnp.asarray(scene["Rcb"], dtype),
        tcb=jnp.asarray(scene["tcb"], dtype),
    )


# ---------------------------------------------------------------------------
# synthetic IMU generation
# ---------------------------------------------------------------------------


def analytic_trajectory(t):
    """Smooth 6-dof trajectory: returns (Rwb, p, v, a_world, gyr_body)."""
    from scipy.spatial.transform import Rotation

    w1, w2, w3 = 0.8, 0.6, 0.5
    p = np.array([
        0.5 * np.sin(w1 * t) + 0.25 * t,
        0.3 * np.sin(w2 * t + 1.0),
        0.2 * np.sin(w3 * t),
    ])
    v = np.array([
        0.5 * w1 * np.cos(w1 * t) + 0.25,
        0.3 * w2 * np.cos(w2 * t + 1.0),
        0.2 * w3 * np.cos(w3 * t),
    ])
    a = np.array([
        -0.5 * w1 * w1 * np.sin(w1 * t),
        -0.3 * w2 * w2 * np.sin(w2 * t + 1.0),
        -0.2 * w3 * w3 * np.sin(w3 * t),
    ])
    theta = np.array([
        0.10 * np.sin(0.30 * t),
        0.10 * np.sin(0.40 * t),
        0.20 * np.sin(0.25 * t),
    ])
    dtheta = np.array([
        0.10 * 0.30 * np.cos(0.30 * t),
        0.10 * 0.40 * np.cos(0.40 * t),
        0.20 * 0.25 * np.cos(0.25 * t),
    ])
    R = Rotation.from_rotvec(theta).as_matrix()
    return R, p, v, a, dtheta


def make_imu_sequence(duration=8.0, rate=200.0, g_value=9.81,
                      bg=None, ba=None, noise=0.0, seed=0):
    """Sampled IMU measurements along the analytic trajectory.

    Returns dict with times (N,), Rwb (N,3,3), pos, vel (world), and the
    measured gyr/acc (body frame, with biases + optional noise). The gyro is
    the exact body rate from consecutive rotations (midpoint-consistent)."""
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(seed)
    bg = np.zeros(3) if bg is None else np.asarray(bg)
    ba = np.zeros(3) if ba is None else np.asarray(ba)
    n = int(duration * rate) + 1
    dt = 1.0 / rate
    times = np.arange(n) * dt
    Rwb = np.zeros((n, 3, 3))
    pos = np.zeros((n, 3))
    vel = np.zeros((n, 3))
    acc_m = np.zeros((n, 3))
    gyr_m = np.zeros((n, 3))
    g_world = np.array([0.0, 0.0, -g_value])
    for i, t in enumerate(times):
        R, p, v, a, _ = analytic_trajectory(t)
        Rwb[i] = R
        pos[i] = p
        vel[i] = v
        acc_m[i] = R.T @ (a - g_world) + ba
    # body rates from consecutive rotations (exact for the sampling step)
    for i in range(n - 1):
        dRot = Rwb[i].T @ Rwb[i + 1]
        gyr_m[i] = Rotation.from_matrix(dRot).as_rotvec() / dt + bg
    gyr_m[-1] = gyr_m[-2]
    if noise > 0:
        acc_m += rng.randn(n, 3) * noise
        gyr_m += rng.randn(n, 3) * noise * 0.1
    return dict(times=times, Rwb=Rwb, pos=pos, vel=vel, acc=acc_m, gyr=gyr_m,
                bg=bg, ba=ba, g_value=g_value)

"""Backend tests: residual correctness vs numpy oracles and LM convergence on
synthetic scenes (the role g2o's convergence plays in the reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airslam_tpu.backend import gn, windows
from airslam_tpu.backend import residuals as res
from airslam_tpu.core import lie
from tests.synthetic import make_point_scene, build_problem, default_intrinsics


def test_point_residual_zero_at_truth():
    scene = make_point_scene(f=2, p=10)
    prob = build_problem(scene)
    chi2, depth_ok = gn.point_chi2(prob, scene["intr"])
    chi2 = np.asarray(chi2)[np.asarray(prob.point_obs_mask)]
    assert chi2.max() < 1e-16
    assert np.asarray(depth_ok)[np.asarray(prob.point_obs_mask)].all()


def test_point_residual_matches_manual():
    """Residual = obs − (π(p), u_r) with the reference's stereo model."""
    intr = default_intrinsics()
    Rcw = np.eye(3)
    tcw = np.array([0.1, -0.2, 0.3])
    point = np.array([1.0, 0.5, 5.0])
    pc = Rcw @ point + tcw
    u = pc[0] / pc[2] * 450 + 376
    v = pc[1] / pc[2] * 450 + 240
    ur = u - 45.0 / pc[2]
    obs = np.array([u + 1.0, v - 2.0, ur + 0.5])
    r, z = res.point_residual(jnp.asarray(Rcw), jnp.asarray(tcw), jnp.asarray(point),
                              jnp.asarray(obs), intr)
    assert np.allclose(np.asarray(r), [1.0, -2.0, 0.5], atol=1e-10)
    assert float(z) == pytest.approx(pc[2])


def test_line_residual_zero_on_line():
    """Project a 3D line; its observed 2D endpoints must give zero residual."""
    intr = default_intrinsics()
    p1 = np.array([1.0, 0.5, 5.0])
    p2 = np.array([-1.0, 0.3, 6.0])
    line = lie.line_from_endpoints(jnp.asarray(p1), jnp.asarray(p2))

    def proj(p):
        return np.array([p[0] / p[2] * 450 + 376, p[1] / p[2] * 450 + 240])

    def proj_right(p):
        b = 45.0 / 450.0
        q = p - np.array([b, 0, 0])
        return proj(q)

    obs = np.concatenate([proj(p1), proj(p2), proj_right(p1), proj_right(p2)])
    r = res.line_residual(jnp.eye(3), jnp.zeros(3), line, jnp.asarray(obs), intr)
    assert np.abs(np.asarray(r)).max() < 1e-9


def test_line_residual_is_pixel_distance():
    """For a vertical 3D line, the mono residual equals the horizontal pixel
    offset of the observed endpoint."""
    intr = default_intrinsics()
    p1 = np.array([0.5, -1.0, 5.0])
    p2 = np.array([0.5, 1.0, 5.0])
    line = lie.line_from_endpoints(jnp.asarray(p1), jnp.asarray(p2))
    u_line = 0.5 / 5.0 * 450 + 376
    obs = np.array([u_line + 3.0, 100.0, u_line - 2.0, 300.0, 0, 0, 0, 0])
    r = np.asarray(res.line_residual(jnp.eye(3), jnp.zeros(3), line, jnp.asarray(obs), intr))
    assert abs(abs(r[0]) - 3.0) < 1e-6
    assert abs(abs(r[1]) - 2.0) < 1e-6


def test_relative_pose_residual():
    rng = np.random.RandomState(0)
    from scipy.spatial.transform import Rotation
    R1 = Rotation.random(random_state=rng).as_matrix()
    t1 = rng.randn(3)
    R2 = Rotation.random(random_state=rng).as_matrix()
    t2 = rng.randn(3)
    R12 = R1.T @ R2
    t12 = R1.T @ (t2 - t1)
    r = res.relative_pose_residual(jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2),
                                   jnp.asarray(t2), jnp.asarray(R12), jnp.asarray(t12))
    assert np.abs(np.asarray(r)).max() < 1e-12


# -- LM convergence ---------------------------------------------------------


def test_local_ba_converges_poses_and_points():
    rng = np.random.RandomState(1)
    scene = make_point_scene(f=4, p=60, rng=rng)
    # perturb everything except frame 0
    Rwb0 = scene["Rwb"].copy()
    twb0 = scene["twb"].copy()
    for i in range(1, 4):
        from scipy.spatial.transform import Rotation
        Rwb0[i] = Rwb0[i] @ Rotation.from_rotvec(rng.randn(3) * 0.02).as_matrix()
        twb0[i] = twb0[i] + rng.randn(3) * 0.05
    pts0 = scene["points"] + rng.randn(*scene["points"].shape) * 0.1

    prob = build_problem(scene, Rwb=Rwb0, twb=twb0, points=pts0)
    out, p_in, _ = windows.local_ba(prob, scene["intr"])

    # all observations should be inliers and the solution near ground truth
    assert np.asarray(p_in).sum() == np.asarray(prob.point_obs_mask).sum()
    assert np.abs(np.asarray(out.frames.twb) - scene["twb"]).max() < 1e-3
    for i in range(4):
        dR = np.asarray(out.frames.Rwb[i]).T @ scene["Rwb"][i]
        assert np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)) < 1e-3
    assert np.abs(np.asarray(out.points) - scene["points"]).max() < 5e-3


def test_local_ba_rejects_outliers():
    rng = np.random.RandomState(2)
    scene = make_point_scene(f=3, p=50, rng=rng)
    obs = scene["obs"].copy()
    # corrupt 5 observations of frame 1 badly
    bad = rng.choice(50, 5, replace=False)
    obs[bad, 1, 0] += 80.0
    scene = dict(scene, obs=obs)
    prob = build_problem(scene)
    out, p_in, _ = windows.local_ba(prob, scene["intr"])
    p_in = np.asarray(p_in)
    mask = np.asarray(prob.point_obs_mask)
    for b in bad:
        if mask[b, 1]:
            assert not p_in[b, 1]
    # the good observations survive
    good = np.ones(50, bool)
    good[bad] = False
    assert p_in[good].sum() == mask[good].sum()


def test_pose_only_optimization():
    rng = np.random.RandomState(3)
    scene = make_point_scene(f=1, p=40, rng=rng)
    from scipy.spatial.transform import Rotation
    Rp = scene["Rwb"].copy()
    tp = scene["twb"].copy()
    Rp[0] = Rp[0] @ Rotation.from_rotvec(rng.randn(3) * 0.03).as_matrix()
    tp[0] = tp[0] + rng.randn(3) * 0.1
    prob = build_problem(scene, Rwb=Rp, twb=tp, pose_fixed=np.zeros(1, bool))
    out, p_in, _, n_in = windows.pose_only_optimization(prob, scene["intr"])
    assert int(n_in) == np.asarray(prob.point_obs_mask).sum()
    assert np.abs(np.asarray(out.frames.twb[0]) - scene["twb"][0]).max() < 1e-4
    # landmarks must not have moved
    assert np.array_equal(np.asarray(out.points), np.asarray(prob.points))


def test_pose_only_optimization_outlier_recovery():
    """30% gross outliers: the per-round pose reset (FrameOptimization
    re-seeds the pose vertex each relabeling round, g2o_optimization.cc:730)
    keeps a bad first round from locking in; the pose recovers and the
    outliers are labeled."""
    rng = np.random.RandomState(9)
    scene = make_point_scene(f=1, p=60, rng=rng)
    obs = scene["obs"].copy()
    bad = rng.choice(60, 18, replace=False)  # 30%
    obs[bad, 0, :2] += rng.uniform(40, 120, (18, 2)) * np.sign(rng.randn(18, 2))
    scene = dict(scene, obs=obs)

    from scipy.spatial.transform import Rotation
    Rp = scene["Rwb"].copy()
    tp = scene["twb"].copy()
    Rp[0] = Rp[0] @ Rotation.from_rotvec(rng.randn(3) * 0.05).as_matrix()
    tp[0] = tp[0] + rng.randn(3) * 0.15
    prob = build_problem(scene, Rwb=Rp, twb=tp, pose_fixed=np.zeros(1, bool))
    out, p_in, _, n_in = windows.pose_only_optimization(prob, scene["intr"])
    p_in = np.asarray(p_in)
    mask = np.asarray(prob.point_obs_mask)
    good = np.ones(60, bool)
    good[bad] = False
    # all genuine inliers kept, all gross outliers rejected
    assert p_in[good].sum() == mask[good].sum()
    assert not p_in[bad].any()
    assert np.abs(np.asarray(out.frames.twb[0]) - scene["twb"][0]).max() < 1e-3


def test_local_ba_with_lines():
    """Lines + points jointly: line residuals drive the line estimate back."""
    rng = np.random.RandomState(4)
    scene = make_point_scene(f=3, p=50, rng=rng)
    intr = scene["intr"]

    # one 3D line and its projections
    p1 = np.array([0.5, -1.0, 6.0])
    p2 = np.array([1.5, 1.0, 6.5])
    line_true = np.asarray(lie.line_from_endpoints(jnp.asarray(p1), jnp.asarray(p2)))

    f = 3
    line_obs = np.zeros((1, f, 8))
    line_mask = np.zeros((1, f), bool)
    stereo = np.zeros((1, f), bool)
    fx, fy, cx, cy, bf = 450.0, 450.0, 376.0, 240.0, 45.0
    for i in range(f):
        Rcw = scene["Rcb"] @ scene["Rwb"][i].T
        tcw = scene["tcb"] - Rcw @ scene["twb"][i]
        for k, pt in enumerate([p1, p2]):
            pc = Rcw @ pt + tcw
            line_obs[0, i, 2 * k] = pc[0] / pc[2] * fx + cx
            line_obs[0, i, 2 * k + 1] = pc[1] / pc[2] * fy + cy
            qc = pc - np.array([bf / fx, 0, 0])
            line_obs[0, i, 4 + 2 * k] = qc[0] / qc[2] * fx + cx
            line_obs[0, i, 4 + 2 * k + 1] = qc[1] / qc[2] * fy + cy
        line_mask[0, i] = True
        stereo[0, i] = True

    # perturb the line
    line0 = np.asarray(
        lie.line_orthonormal_oplus(jnp.asarray(line_true), jnp.asarray([0.02, -0.03, 0.01, 0.02]))
    )
    prob = build_problem(
        scene, lines=line0[None], line_obs=line_obs, line_obs_mask=line_mask,
        line_obs_stereo=stereo, line_fixed=np.zeros(1, bool),
    )
    out, _, l_in = windows.local_ba(prob, intr)
    assert np.asarray(l_in).all()
    chi2 = np.asarray(gn.line_chi2(out, intr, 1.0))
    assert chi2.max() < 1e-6  # line re-converged onto the observations


def test_pose_graph_optimization():
    """Odometry chain with drift + loop closure edge pulls poses back."""
    rng = np.random.RandomState(5)
    from scipy.spatial.transform import Rotation
    f = 6
    # ground truth: hexagon loop
    Rwb = np.zeros((f, 3, 3))
    twb = np.zeros((f, 3))
    for i in range(f):
        a = 2 * np.pi * i / f
        Rwb[i] = Rotation.from_euler("z", a).as_matrix()
        twb[i] = [np.cos(a), np.sin(a), 0]

    # measurements: true relative poses (odometry + loop edge)
    ei, ej, Rm, tm = [], [], [], []
    for i in range(f - 1):
        ei.append(i); ej.append(i + 1)
        Rm.append(Rwb[i].T @ Rwb[i + 1])
        tm.append(Rwb[i].T @ (twb[i + 1] - twb[i]))
    ei.append(f - 1); ej.append(0)
    Rm.append(Rwb[f - 1].T @ Rwb[0])
    tm.append(Rwb[f - 1].T @ (twb[0] - twb[f - 1]))

    # drifting initial guess
    Rp, tp = Rwb.copy(), twb.copy()
    for i in range(1, f):
        Rp[i] = Rp[i] @ Rotation.from_rotvec(rng.randn(3) * 0.05).as_matrix()
        tp[i] = tp[i] + rng.randn(3) * 0.1

    fixed = np.zeros(f, bool); fixed[0] = True
    p = windows.PoseGraphProblem(
        Rwb=jnp.asarray(Rp), twb=jnp.asarray(tp), fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        R_meas=jnp.asarray(np.stack(Rm)), t_meas=jnp.asarray(np.stack(tm)),
        mask=jnp.ones(len(ei), bool),
    )
    out = windows.pose_graph_optimization(p, iterations=30)
    assert np.abs(np.asarray(out.twb) - twb).max() < 1e-5


def test_pose_only_fast_matches_general():
    """The F=1 vision pose-only fast path (windows._pose_only_fast) must be
    numerically identical to the general dense solver — same residuals,
    Huber weights, LM schedule and relabeling. The general path is forced by
    padding a second fixed, observation-less frame (the Schur machinery
    cancels exactly, so both solve the same damped 6x6 system)."""
    import numpy as np
    from airslam_tpu.backend import gn, windows
    from airslam_tpu.core import lie

    rng = np.random.RandomState(3)
    K = 64
    intr = default_intrinsics()
    pts = rng.randn(K, 3) * 2 + [0, 0, 8]
    xi = np.array([0.02, -0.03, 0.01, 0.05, -0.04, 0.06])
    Rwb_t = np.asarray(lie.so3_exp(jnp.asarray(xi[:3])))
    twb_t = xi[3:]
    Rcw, tcw = Rwb_t.T, -Rwb_t.T @ twb_t
    pc = (Rcw @ pts.T).T + tcw
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy, bf = float(intr.cx), float(intr.cy), float(intr.bf)
    u = pc[:, 0] / pc[:, 2] * fx + cx
    v = pc[:, 1] / pc[:, 2] * fy + cy
    ur = u - bf / pc[:, 2]
    obs = np.stack([u, v, np.where(np.arange(K) % 2 == 0, ur, -1.0)], -1)
    out_idx = rng.choice(K, K // 5, replace=False)
    obs[out_idx, :2] += rng.randn(len(out_idx), 2) * 40  # 20% outliers

    def build(F):
        frames = gn.FrameStates(
            Rwb=jnp.asarray(np.stack([np.eye(3)] * F)), twb=jnp.zeros((F, 3)),
            vel=jnp.zeros((F, 3)), bg=jnp.zeros((F, 3)), ba=jnp.zeros((F, 3)))
        obs_f = np.zeros((K, F, 3))
        obs_f[:, :, 2] = -1.0
        obs_f[:, 0] = obs
        mask_f = np.zeros((K, F), bool)
        mask_f[:, 0] = True
        return gn.BAProblem(
            frames=frames,
            pose_fixed=jnp.asarray([False] + [True] * (F - 1)),
            vel_fixed=jnp.ones(F, bool),
            points=jnp.asarray(pts), point_fixed=jnp.ones(K, bool),
            point_obs=jnp.asarray(obs_f), point_obs_mask=jnp.asarray(mask_f),
            lines=jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]]),
            line_fixed=jnp.ones(1, bool),
            line_obs=jnp.zeros((1, F, 8)), line_obs_stereo=jnp.zeros((1, F), bool),
            line_obs_mask=jnp.zeros((1, F), bool),
            line_obs_sigma=jnp.full((1, F), 0.5),
            Rwg=jnp.eye(3), gravity_free=jnp.asarray(0.0), imu=None,
            Rcb=jnp.eye(3), tcb=jnp.zeros(3))

    o1, pin1, _, n1 = windows.pose_only_optimization(build(1), intr)
    o2, pin2, _, n2 = windows.pose_only_optimization(build(2), intr)
    np.testing.assert_allclose(np.asarray(o1.frames.Rwb[0]),
                               np.asarray(o2.frames.Rwb[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(o1.frames.twb[0]),
                               np.asarray(o2.frames.twb[0]), atol=1e-12)
    assert int(n1) == int(n2)
    assert (np.asarray(pin1)[:, 0] == np.asarray(pin2)[:, 0]).all()
    # and both recover the true pose despite the outliers
    assert np.linalg.norm(np.asarray(o1.frames.twb[0]) - twb_t) < 1e-6


def test_solve_spd_small_matches_lu():
    """The unrolled-Cholesky small-SPD solver (used per LM iteration by the
    tracking fast paths, where jnp.linalg.solve's pivoted LU while-loop
    dominates TPU latency) is exact: same solution as LU on random damped
    Gauss-Newton-shaped systems at every size the fast paths use."""
    rng = np.random.RandomState(3)
    for n in (3, 6, 15):
        for lam in (1e-5, 1e-3, 1e3):
            J = rng.randn(40, n)
            H = J.T @ J + lam * np.eye(n)
            b = rng.randn(n)
            x = np.asarray(gn.solve_spd_small(jnp.asarray(H), jnp.asarray(b)))
            ref = np.linalg.solve(H, b)
            np.testing.assert_allclose(x, ref, rtol=0, atol=1e-9 * max(1.0, np.abs(ref).max()))
    # jit + grad-through (it sits inside a scanned LM body)
    H = jnp.asarray(np.eye(6) * 2.0)
    b = jnp.arange(6.0)
    x = jax.jit(gn.solve_spd_small)(H, b)
    np.testing.assert_allclose(np.asarray(x), np.arange(6.0) / 2.0, atol=1e-12)


def test_closed_form_spd_inverses_and_solve():
    """inv3_spd / inv4_spd (cofactor / 2x2-block formulas for the damped
    Schur landmark blocks) and solve_spd (Cholesky + triangular solves for
    the reduced pose system) replace jnp.linalg.inv/solve on the LM hot path
    -- on TPU those lower to serial pivoted-LU while-loops. All three must be
    exact on SPD inputs of the shapes the solvers use."""
    rng = np.random.RandomState(7)
    for n, inv in ((3, gn.inv3_spd), (4, gn.inv4_spd)):
        J = rng.randn(64, 12, n)
        H = np.einsum("bri,brj->bij", J, J) + 1e-4 * np.eye(n)
        got = np.asarray(inv(jnp.asarray(H)))
        ref = np.linalg.inv(H)
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=1e-8 * max(1.0, np.abs(ref).max()))
    for n in (90, 227):  # pose-graph / local-BA reduced-system sizes
        J = rng.randn(4 * n, n)
        H = J.T @ J + 1e-3 * np.eye(n)
        b = rng.randn(n)
        x = np.asarray(gn.solve_spd(jnp.asarray(H), jnp.asarray(b)))
        ref = np.linalg.solve(H, b)
        np.testing.assert_allclose(x, ref, rtol=0,
                                   atol=1e-7 * max(1.0, np.abs(ref).max()))

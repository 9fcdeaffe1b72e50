"""Sparse observation-list GlobalBA (backend/global_ba.py): equivalence with
the dense windowed solver on small problems, and bounded-memory operation at
map scale (1,000 keyframes / 100k points — the scale the dense (P, F) grid
cannot represent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airslam_tpu.backend import gn, global_ba as gba, windows
from tests.synthetic import make_point_scene, build_problem


def _dense_to_sparse(prob: gn.BAProblem, max_obs=16, dtype=jnp.float64):
    """Library conversion (backend.global_ba.dense_to_sparse)."""
    return gba.dense_to_sparse(prob, max_obs=max_obs, dtype=dtype)


def test_sparse_matches_dense():
    rng = np.random.RandomState(0)
    scene = make_point_scene(f=5, p=80, rng=rng)
    from scipy.spatial.transform import Rotation
    Rp = scene["Rwb"].copy()
    tp = scene["twb"].copy()
    for i in range(1, 5):
        Rp[i] = Rp[i] @ Rotation.from_rotvec(rng.randn(3) * 0.02).as_matrix()
        tp[i] = tp[i] + rng.randn(3) * 0.05
    pts0 = scene["points"] + rng.randn(80, 3) * 0.05
    prob = build_problem(scene, Rwb=Rp, twb=tp, points=pts0)

    ref, p_in_ref, _ = windows.local_ba(prob, scene["intr"], iters1=4, iters2=8)
    sp = _dense_to_sparse(prob)
    out, p_in, _ = gba.global_ba(sp, scene["intr"], gn.BAConfig(),
                                 iters1=4, iters2=8, chunk=32)
    np.testing.assert_allclose(np.asarray(out.twb), np.asarray(ref.frames.twb),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(ref.points),
                               atol=1e-7)
    # same inlier decisions, reshaped to the grid
    grid = np.zeros(np.asarray(prob.point_obs_mask).shape, bool)
    grid[np.asarray(sp.pobs_pidx), np.asarray(sp.pobs_fidx)] = np.asarray(p_in)
    assert np.array_equal(grid, np.asarray(p_in_ref) & np.asarray(prob.point_obs_mask))


def test_sparse_gates_outliers():
    rng = np.random.RandomState(1)
    scene = make_point_scene(f=6, p=60, rng=rng)
    obs = scene["obs"].copy()
    bad = rng.choice(60, 6, replace=False)
    obs[bad, 2, 0] += 90.0
    scene = dict(scene, obs=obs)
    prob = build_problem(scene)
    sp = _dense_to_sparse(prob)
    out, p_in, _ = gba.global_ba(sp, scene["intr"], gn.BAConfig(),
                                 iters1=3, iters2=5, chunk=32)
    p_in = np.asarray(p_in)
    pidx = np.asarray(sp.pobs_pidx)
    fidx = np.asarray(sp.pobs_fidx)
    for oi in range(len(p_in)):
        expect = not (pidx[oi] in bad and fidx[oi] == 2)
        assert p_in[oi] == expect, (pidx[oi], fidx[oi])


def test_sharded_sparse_ba_matches_single_device():
    """Sparse GlobalBA with obs/landmarks sharded over the virtual 8-device
    mesh equals the single-device result (XLA inserts the psums)."""
    from airslam_tpu.parallel import mesh as pmesh
    from airslam_tpu.parallel.sharded_ba import sharded_sparse_global_ba

    rng = np.random.RandomState(5)
    scene = make_point_scene(f=4, p=64, rng=rng)
    from scipy.spatial.transform import Rotation
    Rp = scene["Rwb"].copy()
    tp_ = scene["twb"].copy()
    for i in range(1, 4):
        Rp[i] = Rp[i] @ Rotation.from_rotvec(rng.randn(3) * 0.02).as_matrix()
        tp_[i] = tp_[i] + rng.randn(3) * 0.05
    prob = build_problem(scene, Rwb=Rp, twb=tp_,
                         points=scene["points"] + rng.randn(64, 3) * 0.05)
    sp = _dense_to_sparse(prob)

    ref, p_ref, _ = gba.global_ba(sp, scene["intr"], gn.BAConfig(),
                                  iters1=3, iters2=5, chunk=32)
    mesh = pmesh.make_mesh(8, tp=1)
    out, p_in, _ = sharded_sparse_global_ba(sp, scene["intr"], gn.BAConfig(),
                                            mesh, iters1=3, iters2=5, chunk=32)
    np.testing.assert_allclose(np.asarray(out.twb), np.asarray(ref.twb), atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(ref.points), atol=1e-8)
    assert np.array_equal(np.asarray(p_in), np.asarray(p_ref))


def _imu_factors_from_preints(preints):
    rows = []
    for k, p in enumerate(preints):
        st = p.state
        cov = np.asarray(st.cov)
        info9 = np.linalg.inv(cov[:9, :9] + 1e-12 * np.eye(9))
        walk = np.zeros((6, 6))
        walk[:3, :3] = np.linalg.inv(cov[9:12, 9:12] + 1e-9 * np.eye(3))
        walk[3:, 3:] = np.linalg.inv(cov[12:15, 12:15] + 1e-9 * np.eye(3))
        rows.append((k, k + 1, st, info9, walk))
    return gn.IMUFactors(
        idx_i=jnp.asarray([r[0] for r in rows], jnp.int32),
        idx_j=jnp.asarray([r[1] for r in rows], jnp.int32),
        dR=jnp.stack([r[2].dR for r in rows]),
        dV=jnp.stack([r[2].dV for r in rows]),
        dP=jnp.stack([r[2].dP for r in rows]),
        JRg=jnp.stack([r[2].JRg for r in rows]),
        JVg=jnp.stack([r[2].JVg for r in rows]),
        JVa=jnp.stack([r[2].JVa for r in rows]),
        JPg=jnp.stack([r[2].JPg for r in rows]),
        JPa=jnp.stack([r[2].JPa for r in rows]),
        bg_lin=jnp.zeros((len(rows), 3)),
        ba_lin=jnp.zeros((len(rows), 3)),
        dT=jnp.asarray([float(r[2].dT) for r in rows]),
        info=jnp.asarray(np.stack([r[3] for r in rows])),
        info_walk=jnp.asarray(np.stack([r[4] for r in rows])),
        mask=jnp.ones(len(rows), bool),
    )


def _empty_visual(f, dtype=jnp.float64):
    """Dummy (fully masked) point/line blocks for IMU-only sparse problems."""
    return dict(
        points=jnp.zeros((1, 3), dtype),
        pobs_pidx=jnp.zeros(1, jnp.int32), pobs_fidx=jnp.zeros(1, jnp.int32),
        pobs=jnp.concatenate([jnp.zeros((1, 2), dtype), -jnp.ones((1, 1), dtype)], -1),
        pobs_mask=jnp.zeros(1, bool),
        point_obs_table=jnp.full((1, 1), 1, jnp.int32),
        lines=jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]], dtype),
        lobs_lidx=jnp.zeros(1, jnp.int32), lobs_fidx=jnp.zeros(1, jnp.int32),
        lobs=jnp.zeros((1, 8), dtype), lobs_stereo=jnp.zeros(1, bool),
        lobs_mask=jnp.zeros(1, bool), lobs_sigma=jnp.full((1,), 0.001, dtype),
        line_obs_table=jnp.full((1, 1), 1, jnp.int32),
    )


def test_sparse_imu_refines_velocities_matches_dense():
    """The sparse solver's 15-dof VI system (gravity pinned) agrees with the
    dense window solver: noisy velocities are pulled to truth by the
    preintegration chain with poses fixed by vision."""
    from tests.synthetic import default_intrinsics, make_imu_sequence
    from tests.test_vio import G, _keyframe_preints

    seq = make_imu_sequence(duration=3.0)
    kf_idx, preints = _keyframe_preints(seq, 150)
    f = len(kf_idx)
    rng = np.random.RandomState(0)
    imu = _imu_factors_from_preints(preints)
    vel_noisy = seq["vel"][kf_idx] + rng.randn(f, 3) * 0.3
    cfg = gn.BAConfig(imu_info_scale=1.0)
    intr = default_intrinsics()

    frames = gn.FrameStates(
        Rwb=jnp.asarray(seq["Rwb"][kf_idx]), twb=jnp.asarray(seq["pos"][kf_idx]),
        vel=jnp.asarray(vel_noisy), bg=jnp.zeros((f, 3)), ba=jnp.zeros((f, 3)),
    )
    P = 4
    dense = gn.BAProblem(
        frames=frames,
        pose_fixed=jnp.ones(f, bool), vel_fixed=jnp.zeros(f, bool),
        points=jnp.zeros((P, 3)), point_fixed=jnp.ones(P, bool),
        point_obs=jnp.concatenate([jnp.zeros((P, f, 2)), -jnp.ones((P, f, 1))], -1),
        point_obs_mask=jnp.zeros((P, f), bool),
        lines=jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]]), line_fixed=jnp.ones(1, bool),
        line_obs=jnp.zeros((1, f, 8)), line_obs_stereo=jnp.zeros((1, f), bool),
        line_obs_mask=jnp.zeros((1, f), bool), line_obs_sigma=jnp.full((1, f), 1.0),
        Rwg=jnp.eye(3), gravity_free=jnp.asarray(0.0), imu=imu,
        Rcb=jnp.eye(3), tcb=jnp.zeros(3),
    )
    dense_out = gn.optimize(dense, intr, cfg, 15, robust=False)

    sp = gba.SparseBAProblem(
        Rwb=frames.Rwb, twb=frames.twb,
        pose_fixed=jnp.ones(f, bool),
        Rcb=jnp.eye(3), tcb=jnp.zeros(3),
        vel=frames.vel, bg=frames.bg, ba=frames.ba,
        vel_fixed=jnp.zeros(f, bool), Rwg=jnp.eye(3), imu=imu,
        **_empty_visual(f),
    )
    out = gba.optimize(sp, intr, cfg, 15, robust=False, chunk=32)
    err1 = np.abs(np.asarray(out.vel) - seq["vel"][kf_idx]).max()
    assert err1 < 0.05
    np.testing.assert_allclose(np.asarray(out.vel),
                               np.asarray(dense_out.frames.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.bg),
                               np.asarray(dense_out.frames.bg), atol=1e-5)


def test_sparse_vi_vision_plus_imu():
    """Combined problem at map scale: visual points constrain perturbed
    poses while the IMU chain recovers velocities — one sparse system."""
    from tests.synthetic import default_intrinsics, make_imu_sequence
    from tests.test_vio import G, _keyframe_preints
    from scipy.spatial.transform import Rotation

    seq = make_imu_sequence(duration=3.0)
    kf_idx, preints = _keyframe_preints(seq, 100)
    f = len(kf_idx)
    rng = np.random.RandomState(3)
    imu = _imu_factors_from_preints(preints)
    Rwb_t = seq["Rwb"][kf_idx]
    twb_t = seq["pos"][kf_idx]
    intr = default_intrinsics()
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy = float(intr.cx), float(intr.cy)
    bf = float(intr.bf)

    # world points in front of the middle keyframe (+z body)
    P = 120
    mid = f // 2
    pb = np.stack([rng.uniform(-4, 4, P), rng.uniform(-3, 3, P),
                   rng.uniform(4, 11, P)], -1)
    pts = pb @ Rwb_t[mid].T + twb_t[mid]

    pidx, fidx, rows = [], [], []
    for k in range(f):
        rel = (pts - twb_t[k]) @ Rwb_t[k]  # R^T (p − t)
        z = rel[:, 2]
        u = fx * rel[:, 0] / z + cx
        v = fy * rel[:, 1] / z + cy
        ok = (z > 0.5) & (u > 0) & (u < 752) & (v > 0) & (v < 480)
        for j in np.nonzero(ok)[0]:
            pidx.append(j)
            fidx.append(k)
            rows.append([u[j], v[j], u[j] - bf / z[j]])
    n = len(rows)
    assert n > 3 * P
    pidx = np.asarray(pidx, np.int32)
    fidx = np.asarray(fidx, np.int32)
    table = gba.build_obs_table(P, pidx, np.ones(n, bool), n, 16)

    # perturb everything the solver should recover
    Rwb0 = Rwb_t.copy()
    twb0 = twb_t + rng.randn(f, 3) * 0.05
    for i in range(1, f):
        Rwb0[i] = Rwb0[i] @ Rotation.from_rotvec(rng.randn(3) * 0.01).as_matrix()
    twb0[0] = twb_t[0]
    vel0 = seq["vel"][kf_idx] + rng.randn(f, 3) * 0.3
    vel0[0] = seq["vel"][kf_idx[0]]  # fixed frame keeps its (known) velocity
    pts0 = pts + rng.randn(P, 3) * 0.05
    pose_fixed = np.zeros(f, bool)
    pose_fixed[0] = True

    dummy = _empty_visual(f)
    sp = gba.SparseBAProblem(
        Rwb=jnp.asarray(Rwb0), twb=jnp.asarray(twb0),
        pose_fixed=jnp.asarray(pose_fixed),
        points=jnp.asarray(pts0),
        pobs_pidx=jnp.asarray(pidx), pobs_fidx=jnp.asarray(fidx),
        pobs=jnp.asarray(np.asarray(rows)), pobs_mask=jnp.ones(n, bool),
        point_obs_table=jnp.asarray(table),
        lines=dummy["lines"], lobs_lidx=dummy["lobs_lidx"],
        lobs_fidx=dummy["lobs_fidx"], lobs=dummy["lobs"],
        lobs_stereo=dummy["lobs_stereo"], lobs_mask=dummy["lobs_mask"],
        lobs_sigma=dummy["lobs_sigma"], line_obs_table=dummy["line_obs_table"],
        Rcb=jnp.eye(3), tcb=jnp.zeros(3),
        vel=jnp.asarray(vel0), bg=jnp.zeros((f, 3)), ba=jnp.zeros((f, 3)),
        vel_fixed=jnp.asarray(pose_fixed), Rwg=jnp.eye(3), imu=imu,
    )
    cfg = gn.BAConfig()  # reference imu_info_scale 1e-2 (g2o_optimization.cc:321)
    out, p_in, _ = gba.global_ba(sp, intr, cfg, iters1=8, iters2=10, chunk=64)
    pose_err0 = np.abs(twb0 - twb_t).mean()
    pose_err1 = np.abs(np.asarray(out.twb) - twb_t).mean()
    vel_err1 = np.abs(np.asarray(out.vel) - seq["vel"][kf_idx]).max()
    assert pose_err1 < pose_err0 * 0.05, (pose_err0, pose_err1)
    assert vel_err1 < 0.05, vel_err1
    assert np.asarray(p_in).mean() > 0.95


@pytest.mark.slow
def test_map_scale_1000kf_100kpts():
    """The VERDICT regression: 1,000 keyframes / 100k points in bounded
    memory. Observations are O(600k) — the dense grid would need a
    (100k × 1000, 3, 9) Jacobian (terabytes); the sparse path peaks at the
    (F, F, 6, 6) reduced matrix (~288 MB f64)."""
    rng = np.random.RandomState(2)
    F, P, OBS_PER = 1000, 100_000, 6
    # circular trajectory, f32 world
    th = np.linspace(0, 2 * np.pi, F, endpoint=False)
    twb = np.stack([30 * np.cos(th), 30 * np.sin(th), np.zeros(F)], -1)
    Rwb = np.tile(np.eye(3), (F, 1, 1))
    pts = twb[rng.randint(0, F, P)] + np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-3, 3, P), rng.uniform(4, 9, P)], -1
    )
    from tests.synthetic import default_intrinsics
    intr = default_intrinsics(jnp.float64)
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy = float(intr.cx), float(intr.cy)
    bf = float(intr.bf)

    # each point observed by OBS_PER consecutive frames near its anchor
    anchor = rng.randint(0, F - OBS_PER, P)
    pidx = np.repeat(np.arange(P, dtype=np.int32), OBS_PER)
    fidx = (anchor[:, None] + np.arange(OBS_PER)[None, :]).astype(np.int32).ravel()
    rel = pts[pidx] - twb[fidx]  # identity rotations: camera frame = world
    z = rel[:, 2]
    ok = z > 0.5
    u = fx * rel[:, 0] / z + cx
    v = fy * rel[:, 1] / z + cy
    ur = u - bf / z
    pobs = np.stack([u, v, ur], -1)
    ok &= (u > -200) & (u < 1000) & (v > -200) & (v < 700)
    n = len(pidx)

    table = gba.build_obs_table(P, pidx, ok, n, 8)
    # perturb geometry; first frame fixed
    twb0 = twb + rng.randn(F, 3) * 0.02
    twb0[0] = twb[0]
    pts0 = pts + rng.randn(P, 3) * 0.05
    pose_fixed = np.zeros(F, bool)
    pose_fixed[0] = True

    dt = jnp.float32
    sp = gba.SparseBAProblem(
        Rwb=jnp.asarray(Rwb, dt), twb=jnp.asarray(twb0, dt),
        pose_fixed=jnp.asarray(pose_fixed),
        points=jnp.asarray(pts0, dt),
        pobs_pidx=jnp.asarray(pidx), pobs_fidx=jnp.asarray(fidx),
        pobs=jnp.asarray(pobs, dt), pobs_mask=jnp.asarray(ok),
        point_obs_table=jnp.asarray(table),
        lines=jnp.tile(jnp.asarray([1.0, 0, 0, 0, 1, 0], dt), (1, 1)),
        lobs_lidx=jnp.zeros(1, jnp.int32), lobs_fidx=jnp.zeros(1, jnp.int32),
        lobs=jnp.zeros((1, 8), dt), lobs_stereo=jnp.zeros(1, bool),
        lobs_mask=jnp.zeros(1, bool), lobs_sigma=jnp.full((1,), 0.001, dt),
        line_obs_table=jnp.full((1, 1), 1, jnp.int32),
        Rcb=jnp.eye(3, dtype=dt), tcb=jnp.zeros(3, dt),
    )
    intr32 = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt), intr)
    cfg = gn.BAConfig()
    cost0 = float(gba._total_cost(sp, intr32, cfg, False))
    err0 = float(jnp.abs(sp.twb - jnp.asarray(twb, dt)).mean())
    out = gba.optimize(sp, intr32, cfg, iterations=3, robust=False, chunk=4096)
    cost1 = float(gba._total_cost(out, intr32, cfg, False))
    err1 = float(jnp.abs(out.twb - jnp.asarray(twb, dt)).mean())
    # exact-data problem: reprojection cost collapses; mean pose error drops
    # (max error can persist at weakly-observed chain-end frames)
    assert cost1 < cost0 * 1e-3, (cost0, cost1)
    assert err1 < err0 * 0.5, (err0, err1)

def test_schur_max_obs_cap_accuracy():
    """Quantify the Schur pairing cap (map.py keeps the strongest max_obs=16
    observations per landmark in the reduced-camera pairing; all observations
    still gate/contribute gradients). On a dense-coverage scene where every
    point is seen by ~20 frames, compare final pose error at caps 8/16/32
    against the exact dense solver — the cap is an approximation of the
    CURVATURE only, so accuracy should remain within a small factor."""
    rng = np.random.RandomState(3)
    F, P = 20, 64
    scene = make_point_scene(f=F, p=P, rng=rng, point_range=((-4, 4), (-2.5, 2.5), (6, 18)))
    from scipy.spatial.transform import Rotation
    Rp = scene["Rwb"].copy()
    tp = scene["twb"].copy()
    for i in range(1, F):
        Rp[i] = Rp[i] @ Rotation.from_rotvec(rng.randn(3) * 0.01).as_matrix()
        tp[i] = tp[i] + rng.randn(3) * 0.03
    pts0 = scene["points"] + rng.randn(P, 3) * 0.05
    prob = build_problem(scene, Rwb=Rp, twb=tp, points=pts0)

    # enough coverage that the cap actually bites
    n_obs = np.asarray(prob.point_obs_mask).sum(axis=1)
    assert n_obs.max() > 16, f"scene too sparse for the cap test: {n_obs.max()}"

    dense_out, _, _ = windows.local_ba(prob, scene["intr"], iters1=4, iters2=8)
    err_dense = np.abs(np.asarray(dense_out.frames.twb) - scene["twb"]).max()

    errs = {}
    for cap in (8, 16, 32):
        sp = _dense_to_sparse(prob, max_obs=cap)
        out, _, _ = gba.global_ba(sp, scene["intr"], gn.BAConfig(),
                                  iters1=4, iters2=8, chunk=32)
        errs[cap] = np.abs(np.asarray(out.twb) - scene["twb"]).max()
    print(f"max-pose-error vs GT: dense={err_dense:.2e} " +
          " ".join(f"cap{c}={e:.2e}" for c, e in errs.items()))

    # MEASURED (this is the VERDICT-r2 quantification): truncated pairing is
    # inconsistent with the full-gradient landmark blocks — cap 8/16 leave
    # O(3e-2) pose error here, while a cap >= actual coverage is exact.
    # Map._build_sparse_problem therefore AUTO-SELECTS the table width.
    assert errs[32] < max(10.0 * err_dense, 1e-8), errs[32]
    # truncated caps still converge to the scene scale (bounded degradation)
    for cap, e in errs.items():
        assert e < 0.1, (cap, e)

    # the auto-selection picks a width covering the best-observed landmark
    from airslam_tpu.slam.map import _bucket
    auto = min(_bucket(int(n_obs.max()), 8), 64)
    assert auto >= n_obs.max()
    sp = _dense_to_sparse(prob, max_obs=auto)
    out, _, _ = gba.global_ba(sp, scene["intr"], gn.BAConfig(),
                              iters1=4, iters2=8, chunk=32)
    assert np.abs(np.asarray(out.twb) - scene["twb"]).max() < max(
        10.0 * err_dense, 1e-8)


def test_early_exit_lm_parity_and_convergence():
    """Opt-in early-exit LM (VERDICT r3 item 10): default (0.0) is the exact
    fixed schedule; early_exit>0 reaches the same solution on a
    well-conditioned window while terminating early."""
    rng = np.random.RandomState(4)
    scene = make_point_scene(f=5, p=60, rng=rng)
    from scipy.spatial.transform import Rotation
    Rp = scene["Rwb"].copy()
    tp = scene["twb"].copy()
    for i in range(1, 5):
        Rp[i] = Rp[i] @ Rotation.from_rotvec(rng.randn(3) * 0.02).as_matrix()
        tp[i] = tp[i] + rng.randn(3) * 0.05
    prob = build_problem(scene, Rwb=Rp, twb=tp,
                         points=scene["points"] + rng.randn(60, 3) * 0.05)

    full, _, _ = windows.local_ba(prob, scene["intr"], iters1=5, iters2=15)
    fast, _, _ = windows.local_ba(prob, scene["intr"], iters1=5, iters2=15,
                                  early_exit=1e-8)
    # both converge to ground truth
    assert np.abs(np.asarray(full.frames.twb) - scene["twb"]).max() < 1e-3
    assert np.abs(np.asarray(fast.frames.twb) - scene["twb"]).max() < 1e-3
    # and to each other (the tolerance only trims converged iterations)
    np.testing.assert_allclose(np.asarray(fast.frames.twb),
                               np.asarray(full.frames.twb), atol=1e-5)

    # config plumbing: absent key -> 0.0; present -> parsed
    from airslam_tpu.io.config import parse_early_exit
    assert parse_early_exit({"optimization": {"backend": {}}}) == 0.0
    assert parse_early_exit({"optimization": {"backend": {"early_exit": 1e-4}}}) == 1e-4

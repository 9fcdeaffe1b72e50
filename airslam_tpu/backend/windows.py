"""Optimization windows: the reference's g2o entry points re-expressed on the
batched LM core.

- :func:`local_ba` ↔ ``LocalmapOptimization`` (g2o_optimization.cc:79-444):
  robust optimize(5) → chi² outlier gating (+ depth-positive check for
  points) → non-robust optimize(15) on inliers → final inlier flags.
- :func:`pose_only_optimization` ↔ ``FrameOptimization``
  (g2o_optimization.cc:446-898): landmarks fixed, up to ``rounds`` × 10
  iterations with per-round chi² relabeling; returns the inlier count.
- :func:`pose_graph_optimization` ↔ ``PoseGraphOptimization``
  (g2o_optimization.cc:1431-1486): relative-pose edges, 20 iterations,
  solved as one dense LM problem (6·F dims — dense Cholesky on MXU).
- :func:`imu_initialization` ↔ ``IMUInitialization``
  (g2o_optimization.cc:900-1082) plus the closed-form seeds
  :func:`compute_gyr_bias` / :func:`compute_velocity`
  (g2o_optimization.cc:1136-1229).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from airslam_tpu.backend import gn
from airslam_tpu.backend import residuals as res
from airslam_tpu.core import lie

# LM damping schedule shared by the scan solvers below and the whole-solver
# Pallas kernel (backend/pose_gn_pallas.py) — the two "identical numerics"
# tracking paths must never diverge, so both import these.
POSE_LM_LAM0 = 1e-5 * 100.0  # g2o: tau * max(diag(H)); diag ~O(1e2)
POSE_LM_NU0 = 2.0


@functools.partial(jax.jit, static_argnames=("iters1", "iters2", "early_exit"))
def local_ba(
    problem: gn.BAProblem,
    intr,
    cfg: gn.BAConfig = gn.BAConfig(),
    iters1: int = 5,
    iters2: int = 15,
    early_exit: float = 0.0,
):
    """Two-stage sliding-window BA with chi² gating. Returns
    (problem, point_inlier (P, F), line_inlier (L, F)).

    ``early_exit`` > 0 (opt-in, static): terminate either LM stage when an
    accepted step's relative improvement drops below it (see gn.optimize)."""
    problem = gn.optimize(problem, intr, cfg, iters1, robust=True,
                          early_exit=early_exit)

    # gate outliers (g2o_optimization.cc:350-385)
    pchi2, depth_ok = gn.point_chi2(problem, intr)
    is_stereo = problem.point_obs[..., 2] >= 0
    pthr = jnp.where(is_stereo, cfg.stereo_point, cfg.mono_point)
    p_in = (pchi2 <= pthr) & depth_ok & problem.point_obs_mask
    lchi2 = gn.line_chi2(problem, intr)
    lthr = jnp.where(problem.line_obs_stereo, cfg.stereo_line, cfg.mono_line)
    l_in = (lchi2 <= lthr) & problem.line_obs_mask

    gated = problem._replace(point_obs_mask=p_in, line_obs_mask=l_in)
    gated = gn.optimize(gated, intr, cfg, iters2, robust=False,
                        early_exit=early_exit)

    # final inlier flags (g2o_optimization.cc:389-407) on the original masks
    final = gated._replace(
        point_obs_mask=problem.point_obs_mask, line_obs_mask=problem.line_obs_mask
    )
    pchi2, depth_ok = gn.point_chi2(final, intr)
    point_inlier = (pchi2 <= pthr) & depth_ok & problem.point_obs_mask
    lchi2 = gn.line_chi2(final, intr)
    line_inlier = (lchi2 <= lthr) & problem.line_obs_mask
    return final, point_inlier, line_inlier


def _pose6_residuals(problem: gn.BAProblem, intr, Rwb, twb, with_jac: bool):
    """Point/line residuals + 6-dof pose Jacobians for the F=1 pose-only
    problem (landmarks fixed). Same residual definitions as the dense grids
    (gn._point_grid_residuals / _line_grid_residuals) restricted to the pose
    block — the general solver's Schur machinery cancels exactly when every
    landmark column is zeroed, leaving this 6×6 system."""

    def onep(point, obs):
        def f(d6):
            R2, t2 = res.retract_pose(Rwb, twb, d6)
            Rcw, tcw = res.pose_to_camera(R2, t2, problem.Rcb, problem.tcb)
            r, z = res.point_residual(Rcw, tcw, point, obs, intr)
            return r, (r, z)

        if with_jac:
            J, (r, z) = gn._jac_with_value(f, 6)
            return r, z, J
        r, z = f(jnp.zeros((6,), problem.points.dtype))[1]
        return r, z, jnp.zeros((3, 6), problem.points.dtype)

    pr, pz, pJ = jax.vmap(onep)(problem.points, problem.point_obs[:, 0, :])

    def onel(line, obs):
        def f(d6):
            R2, t2 = res.retract_pose(Rwb, twb, d6)
            Rcw, tcw = res.pose_to_camera(R2, t2, problem.Rcb, problem.tcb)
            r = res.line_residual(Rcw, tcw, line, obs, intr)
            return r, r

        if with_jac:
            J, (r, _) = gn._jac_with_value(f, 6)
            return r, J
        return f(jnp.zeros((6,), problem.lines.dtype))[0], jnp.zeros(
            (4, 6), problem.lines.dtype
        )

    lr, lJ = jax.vmap(onel)(problem.lines, problem.line_obs[:, 0, :])
    return pr, pz, pJ, lr, lJ


def _pose_only_fast(problem, intr, cfg, rounds: int, iters: int):
    """F=1, landmarks-fixed, no-IMU specialization of the pose-only path:
    identical residuals, Huber weights, LM damping schedule and per-round
    relabeling as the general solver, but assembled directly as one damped
    6×6 system per iteration (~10× lower sequential kernel depth on TPU —
    the per-frame tracking hot path)."""
    dtype = problem.points.dtype
    frames0 = problem.frames
    base_p_mask = problem.point_obs_mask[:, 0]
    base_l_mask = problem.line_obs_mask[:, 0]
    is_stereo = problem.point_obs[:, 0, 2] >= 0
    pthr = jnp.where(is_stereo, cfg.stereo_point, cfg.mono_point)
    lthr = jnp.where(problem.line_obs_stereo[:, 0], cfg.stereo_line, cfg.mono_line)
    lsigma = problem.line_obs_sigma[:, 0]
    pose_free = (~problem.pose_fixed[0]).astype(dtype)

    def masks_rows(p_mask, l_mask):
        prow = jnp.stack([p_mask, p_mask, p_mask & is_stereo], -1).astype(dtype)
        lrow = jnp.stack(
            [l_mask, l_mask, l_mask & problem.line_obs_stereo[:, 0],
             l_mask & problem.line_obs_stereo[:, 0]], -1
        ).astype(dtype)
        return prow, lrow

    def cost_of(Rwb, twb, p_mask, l_mask, robust=True):
        pr, _, _, lr, _ = _pose6_residuals(problem, intr, Rwb, twb, False)
        prow, lrow = masks_rows(p_mask, l_mask)
        pchi2 = jnp.sum(pr * pr * prow, -1)
        lchi2 = jnp.sum(lr * lr * lrow, -1) * lsigma
        return (gn._huber_cost(pchi2, pthr, p_mask)
                + gn._huber_cost(lchi2, lthr, l_mask))

    def run_round(Rwb, twb, p_mask, l_mask):
        prow, lrow = masks_rows(p_mask, l_mask)

        def body(carry, _):
            R, t, lam, nu, cost = carry
            pr, _, pJ, lr, lJ = _pose6_residuals(problem, intr, R, t, True)
            pchi2 = jnp.sum(pr * pr * prow, -1)
            pw = res.huber_weight(pchi2, pthr) * p_mask
            lchi2 = jnp.sum(lr * lr * lrow, -1) * lsigma
            lw = res.huber_weight(lchi2, lthr) * l_mask * lsigma
            pJ = pJ * prow[..., None] * pose_free
            lJ = lJ * lrow[..., None] * pose_free
            prw = pr * prow
            lrw = lr * lrow
            H = (jnp.einsum("k,kri,krj->ij", pw, pJ, pJ)
                 + jnp.einsum("k,kri,krj->ij", lw, lJ, lJ))
            b = -(jnp.einsum("k,kri,kr->i", pw, pJ, prw)
                  + jnp.einsum("k,kri,kr->i", lw, lJ, lrw))
            H = H + lam * jnp.eye(6, dtype=dtype)
            diag = jnp.diagonal(H)
            H = H + jnp.diag(jnp.where(diag < 1e-10, 1.0, 0.0))
            dx = gn.solve_spd_small(H, b)
            R2, t2 = res.retract_pose(R, t, dx)
            new_cost = cost_of(R2, t2, p_mask, l_mask)
            accept = new_cost < cost
            R3 = jnp.where(accept, R2, R)
            t3 = jnp.where(accept, t2, t)
            lam2 = jnp.where(accept, lam / 3.0, lam * nu)
            nu2 = jnp.where(accept, 2.0, nu * 2.0)
            cost2 = jnp.where(accept, new_cost, cost)
            return (R3, t3, lam2, nu2, cost2), None

        cost0 = cost_of(Rwb, twb, p_mask, l_mask)
        lam0 = jnp.asarray(POSE_LM_LAM0, dtype)
        (R, t, _, _, _), _ = jax.lax.scan(
            body, (Rwb, twb, lam0, jnp.asarray(POSE_LM_NU0, dtype), cost0),
            None, length=iters,
        )
        # relabel over the FULL base observation set
        pr, pz, _, lr, _ = _pose6_residuals(problem, intr, R, t, False)
        prow, lrow = masks_rows(base_p_mask, base_l_mask)
        pchi2 = jnp.sum(pr * pr * prow, -1)
        p_in = (pchi2 <= pthr) & (pz > 0) & base_p_mask
        lchi2 = jnp.sum(lr * lr * lrow, -1) * lsigma
        l_in = (lchi2 <= lthr) & base_l_mask
        return R, t, p_in, l_in

    p_mask, l_mask = base_p_mask, base_l_mask
    for _ in range(rounds):
        R, t, p_mask, l_mask = run_round(frames0.Rwb[0], frames0.twb[0],
                                         p_mask, l_mask)

    out = problem._replace(
        frames=problem.frames._replace(Rwb=R[None], twb=t[None])
    )
    num_inliers = jnp.sum(p_mask) + jnp.sum(l_mask)
    return out, p_mask[:, None], l_mask[:, None], num_inliers


def _pose_only_fast_vi(problem, intr, cfg, rounds: int, iters: int):
    """VI tracking specialization: F=2 with frame 0 the FIXED last keyframe
    and frame 1 the current frame (pose + velocity + bias free, 15 dof), one
    IMU factor 0→1, gravity fixed (the reference's FrameOptimization keeps
    the gravity-direction vertex fixed, g2o_optimization.cc:446-898). One
    damped 15×15 system per LM iteration; numerics identical to the general
    dense path."""
    dtype = problem.points.dtype
    fr0 = problem.frames
    imu = problem.imu
    cur = 1
    base_p_mask = problem.point_obs_mask[:, cur]
    base_l_mask = problem.line_obs_mask[:, cur]
    is_stereo = problem.point_obs[:, cur, 2] >= 0
    pthr = jnp.where(is_stereo, cfg.stereo_point, cfg.mono_point)
    lthr = jnp.where(problem.line_obs_stereo[:, cur], cfg.stereo_line, cfg.mono_line)
    lsigma = problem.line_obs_sigma[:, cur]
    pose_free = (~problem.pose_fixed[cur]).astype(dtype)
    vel_free = (~problem.vel_fixed[cur]).astype(dtype)
    col_free = jnp.concatenate([jnp.full((6,), 1.0, dtype) * pose_free,
                                jnp.full((9,), 1.0, dtype) * vel_free])
    Ri, ti, vi = fr0.Rwb[0], fr0.twb[0], fr0.vel[0]
    bgi, bai = fr0.bg[0], fr0.ba[0]
    info9 = imu.info[0] * cfg.imu_info_scale
    info_walk = imu.info_walk[0] * imu.mask[0].astype(dtype)
    imu_mask = imu.mask[0].astype(dtype)

    def masks_rows(p_mask, l_mask):
        prow = jnp.stack([p_mask, p_mask, p_mask & is_stereo], -1).astype(dtype)
        lrow = jnp.stack(
            [l_mask, l_mask, l_mask & problem.line_obs_stereo[:, cur],
             l_mask & problem.line_obs_stereo[:, cur]], -1
        ).astype(dtype)
        return prow, lrow

    def vis_residuals(R, t, with_jac):
        p1 = problem._replace(frames=gn.FrameStates(
            Rwb=R[None], twb=t[None], vel=fr0.vel[1:2], bg=fr0.bg[1:2],
            ba=fr0.ba[1:2]))
        # reuse the F=1 residual helper on the current column's observations
        p1 = p1._replace(point_obs=problem.point_obs[:, cur:cur + 1],
                         line_obs=problem.line_obs[:, cur:cur + 1])
        return _pose6_residuals(p1, intr, R, t, with_jac)

    def imu_residual_15(R, t, v, bg, ba, with_jac):
        def f(d15):
            Rj2, tj2 = res.retract_pose(R, t, d15[0:6])
            vj2 = v + d15[6:9]
            bgj2 = bg + d15[9:12]
            baj2 = ba + d15[12:15]
            r9 = res.imu_residual(
                Ri, ti, vi, Rj2, tj2, vj2, bgj2, baj2,
                imu.dR[0], imu.dV[0], imu.dP[0],
                imu.JRg[0], imu.JVg[0], imu.JVa[0], imu.JPg[0], imu.JPa[0],
                imu.bg_lin[0], imu.ba_lin[0], imu.dT[0], problem.Rwg,
                problem.g_value,
            )
            rw = jnp.concatenate([bgj2 - bgi, baj2 - bai])
            r = jnp.concatenate([r9, rw])
            return r, r

        if with_jac:
            J, (r, _) = gn._jac_with_value(f, 15)
            return r, J * col_free[None, :]
        return f(jnp.zeros((15,), dtype))[0], None

    def cost_of(R, t, v, bg, ba, p_mask, l_mask):
        pr, _, _, lr, _ = vis_residuals(R, t, False)
        prow, lrow = masks_rows(p_mask, l_mask)
        pchi2 = jnp.sum(pr * pr * prow, -1)
        lchi2 = jnp.sum(lr * lr * lrow, -1) * lsigma
        cost = (gn._huber_cost(pchi2, pthr, p_mask)
                + gn._huber_cost(lchi2, lthr, l_mask))
        ir, _ = imu_residual_15(R, t, v, bg, ba, False)
        r9, rw = ir[:9], ir[9:]
        c_imu = r9 @ info9 @ r9
        c_walk = rw @ info_walk @ rw
        cost = cost + gn._huber_cost(c_imu[None], 16.92, imu.mask[0:1]) + c_walk
        return cost

    def run_round(R, t, v, bg, ba, p_mask, l_mask):
        prow, lrow = masks_rows(p_mask, l_mask)

        def body(carry, _):
            R, t, v, bg, ba, lam, nu, cost = carry
            pr, _, pJ6, lr, lJ6 = vis_residuals(R, t, True)
            pchi2 = jnp.sum(pr * pr * prow, -1)
            pw = res.huber_weight(pchi2, pthr) * p_mask
            lchi2 = jnp.sum(lr * lr * lrow, -1) * lsigma
            lw = res.huber_weight(lchi2, lthr) * l_mask * lsigma
            pJ6 = pJ6 * prow[..., None] * pose_free
            lJ6 = lJ6 * lrow[..., None] * pose_free
            prw = pr * prow
            lrw = lr * lrow
            H6 = (jnp.einsum("k,kri,krj->ij", pw, pJ6, pJ6)
                  + jnp.einsum("k,kri,krj->ij", lw, lJ6, lJ6))
            b6 = -(jnp.einsum("k,kri,kr->i", pw, pJ6, prw)
                   + jnp.einsum("k,kri,kr->i", lw, lJ6, lrw))
            H = jnp.zeros((15, 15), dtype).at[:6, :6].set(H6)
            b = jnp.zeros((15,), dtype).at[:6].set(b6)

            ir, iJ = imu_residual_15(R, t, v, bg, ba, True)
            r9 = ir[:9]
            c_imu = r9 @ info9 @ r9
            wi = res.huber_weight(c_imu[None], jnp.full((1,), 16.92))[0] * imu_mask
            big_info = jnp.zeros((15, 15), dtype)
            big_info = big_info.at[:9, :9].set(info9 * wi)
            big_info = big_info.at[9:, 9:].set(info_walk)
            JtW = iJ.T @ big_info  # (15, 15)
            H = H + JtW @ iJ
            b = b - JtW @ ir

            H = H + lam * jnp.eye(15, dtype=dtype)
            diag = jnp.diagonal(H)
            H = H + jnp.diag(jnp.where(diag < 1e-10, 1.0, 0.0))
            dx = gn.solve_spd_small(H, b)
            R2, t2 = res.retract_pose(R, t, dx[0:6])
            v2 = v + dx[6:9]
            bg2 = bg + dx[9:12]
            ba2 = ba + dx[12:15]
            new_cost = cost_of(R2, t2, v2, bg2, ba2, p_mask, l_mask)
            accept = new_cost < cost
            pick = lambda a, b2: jnp.where(accept, a, b2)
            carry2 = (pick(R2, R), pick(t2, t), pick(v2, v), pick(bg2, bg),
                      pick(ba2, ba), jnp.where(accept, lam / 3.0, lam * nu),
                      jnp.where(accept, 2.0, nu * 2.0),
                      jnp.where(accept, new_cost, cost))
            return carry2, None

        cost0 = cost_of(R, t, v, bg, ba, p_mask, l_mask)
        lam0 = jnp.asarray(POSE_LM_LAM0, dtype)
        (R, t, v, bg, ba, _, _, _), _ = jax.lax.scan(
            body, (R, t, v, bg, ba, lam0, jnp.asarray(POSE_LM_NU0, dtype), cost0),
            None, length=iters,
        )
        pr, pz, _, lr, _ = vis_residuals(R, t, False)
        prow, lrow = masks_rows(base_p_mask, base_l_mask)
        pchi2 = jnp.sum(pr * pr * prow, -1)
        p_in = (pchi2 <= pthr) & (pz > 0) & base_p_mask
        lchi2 = jnp.sum(lr * lr * lrow, -1) * lsigma
        l_in = (lchi2 <= lthr) & base_l_mask
        return R, t, v, bg, ba, p_in, l_in

    p_mask, l_mask = base_p_mask, base_l_mask
    v, bg, ba = fr0.vel[cur], fr0.bg[cur], fr0.ba[cur]
    for _ in range(rounds):
        # per-round reset re-seeds the pose; velocity/bias keep running
        R, t, v, bg, ba, p_mask, l_mask = run_round(
            fr0.Rwb[cur], fr0.twb[cur], v, bg, ba, p_mask, l_mask)

    new_frames = gn.FrameStates(
        Rwb=jnp.stack([fr0.Rwb[0], R]), twb=jnp.stack([fr0.twb[0], t]),
        vel=jnp.stack([fr0.vel[0], v]), bg=jnp.stack([fr0.bg[0], bg]),
        ba=jnp.stack([fr0.ba[0], ba]),
    )
    out = problem._replace(frames=new_frames)
    zeros_p = jnp.zeros_like(p_mask)
    zeros_l = jnp.zeros_like(l_mask)
    p_in2 = jnp.stack([zeros_p, p_mask], -1)
    l_in2 = jnp.stack([zeros_l, l_mask], -1)
    num_inliers = jnp.sum(p_mask) + jnp.sum(l_mask)
    return out, p_in2, l_in2, num_inliers


_fast_jit = functools.partial(jax.jit, static_argnames=("rounds", "iters"))
_pose_only_fast_j = _fast_jit(_pose_only_fast)
_pose_only_fast_vi_j = _fast_jit(_pose_only_fast_vi)


def pose_only_optimization(
    problem: gn.BAProblem,
    intr,
    cfg: gn.BAConfig = gn.BAConfig(),
    rounds: int = 3,
    iters: int = 10,
    vi_tracking: Optional[bool] = None,
):
    """Pose-only optimization: all landmarks fixed (the caller sets
    ``point_fixed``/``line_fixed`` to all-True). Per round: reset the pose to
    the initial estimate (``current_frame->setEstimate(current_pose)`` at the
    top of every round, g2o_optimization.cc:730), optimize with the Huber
    kernel on currently-active observations, then relabel by chi².
    Returns (problem, point_inlier, line_inlier, num_inliers).

    Dispatch (identical numerics in every branch, regression-tested):
    - vision F=1 → :func:`_pose_only_fast` (one damped 6×6 per iteration);
    - VI tracking shape (F=2, one IMU factor, frame 0 fixed with frame 1's
      pose/vel/bias free) → :func:`_pose_only_fast_vi` (15×15);
    - anything else → the general dense solver.

    ``vi_tracking`` makes the VI fast path explicit: ``True`` asserts the
    tracking layout (required when calling under jit, where the fix pattern
    cannot be inspected), ``False`` forces the general solver, ``None``
    auto-detects from concrete values — and under a tracer conservatively
    routes to the general solver (never silently assumes the layout)."""
    problem = problem._replace(
        point_fixed=jnp.ones_like(problem.point_fixed),
        line_fixed=jnp.ones_like(problem.line_fixed),
    )
    F = problem.frames.Rwb.shape[0]
    if problem.imu is None and F == 1:
        from . import pose_gn_pallas

        if pose_gn_pallas.available():
            # whole-solver VMEM kernel: same math, one TPU program instead
            # of ~30 sequential scan-iteration kernel chains
            return pose_gn_pallas.pose_only_fast_pallas(
                problem, intr, cfg, rounds=rounds, iters=iters)
        return _pose_only_fast_j(problem, intr, cfg, rounds=rounds, iters=iters)
    vi_shape = (problem.imu is not None and F == 2
                and problem.imu.idx_i.shape[0] == 1)
    if vi_tracking and not vi_shape:
        raise ValueError(
            "vi_tracking=True requires F=2 with exactly one IMU factor "
            f"(got F={F}, imu={'yes' if problem.imu is not None else 'no'})")
    if vi_shape and vi_tracking is not False:
        if vi_tracking is None:
            import numpy as _np

            try:
                pfc = _np.asarray(problem.pose_fixed)
                vfc = _np.asarray(problem.vel_fixed)
                ii = int(_np.asarray(problem.imu.idx_i)[0])
                jj = int(_np.asarray(problem.imu.idx_j)[0])
                vi_tracking = (bool(pfc[0]) and not bool(pfc[1])
                               and bool(vfc[0]) and (ii, jj) == (0, 1))
            except (jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError):
                # under jit the fix pattern is abstract: fall back to the
                # general solver (correct for every layout) rather than
                # guessing; jitted callers with the tracking layout should
                # pass vi_tracking=True.
                vi_tracking = False
        if vi_tracking:
            return _pose_only_fast_vi_j(problem, intr, cfg,
                                        rounds=rounds, iters=iters)
    return _pose_only_general(problem, intr, cfg, rounds=rounds, iters=iters)


@_fast_jit
def _pose_only_general(
    problem: gn.BAProblem,
    intr,
    cfg: gn.BAConfig = gn.BAConfig(),
    rounds: int = 3,
    iters: int = 10,
):
    frames0 = problem.frames
    base_p_mask = problem.point_obs_mask
    base_l_mask = problem.line_obs_mask
    is_stereo = problem.point_obs[..., 2] >= 0
    pthr = jnp.where(is_stereo, cfg.stereo_point, cfg.mono_point)
    lthr = jnp.where(problem.line_obs_stereo, cfg.stereo_line, cfg.mono_line)

    for _ in range(rounds):
        # reset only the pose (the reference re-seeds the pose vertex; the
        # velocity/bias vertices keep their running estimates)
        problem = problem._replace(
            frames=problem.frames._replace(Rwb=frames0.Rwb, twb=frames0.twb)
        )
        problem = gn.optimize(problem, intr, cfg, iters, robust=True)
        # relabel over the FULL base observation set (the reference refreshes
        # outlier edges with computeError() before re-testing chi², so gated
        # observations can return — g2o_optimization.cc:735-739)
        probe = problem._replace(point_obs_mask=base_p_mask, line_obs_mask=base_l_mask)
        pchi2, depth_ok = gn.point_chi2(probe, intr)
        p_in = (pchi2 <= pthr) & depth_ok & base_p_mask
        lchi2 = gn.line_chi2(probe, intr)
        l_in = (lchi2 <= lthr) & base_l_mask
        problem = problem._replace(point_obs_mask=p_in, line_obs_mask=l_in)

    num_inliers = jnp.sum(p_in) + jnp.sum(l_in)
    return problem._replace(point_obs_mask=base_p_mask, line_obs_mask=base_l_mask), p_in, l_in, num_inliers


# ---------------------------------------------------------------------------
# Pose graph
# ---------------------------------------------------------------------------


class PoseGraphProblem(NamedTuple):
    Rwb: jax.Array  # (F, 3, 3)
    twb: jax.Array  # (F, 3)
    fixed: jax.Array  # (F,) bool
    edge_i: jax.Array  # (E,) int32
    edge_j: jax.Array  # (E,)
    R_meas: jax.Array  # (E, 3, 3) relative T_i^-1 T_j measurement
    t_meas: jax.Array  # (E, 3)
    mask: jax.Array  # (E,) bool


def _pose_graph_cost(p: PoseGraphProblem):
    def one(i, j, Rm, tm):
        r = res.relative_pose_residual(p.Rwb[i], p.twb[i], p.Rwb[j], p.twb[j], Rm, tm)
        return jnp.sum(r * r)

    costs = jax.vmap(one)(p.edge_i, p.edge_j, p.R_meas, p.t_meas)
    return jnp.sum(jnp.where(p.mask, costs, 0.0))


@functools.partial(jax.jit, static_argnames=("iterations",))
def pose_graph_optimization(p: PoseGraphProblem, iterations: int = 20) -> PoseGraphProblem:
    """Dense LM over 6F dims with relative-pose residuals."""
    f = p.Rwb.shape[0]
    D = f * 6
    dtype = p.twb.dtype
    free = (~p.fixed).astype(dtype)

    def residuals_and_jac(state):
        Rwb, twb = state

        def one(i, j, Rm, tm):
            def fe(delta):
                Ri, ti = res.retract_pose(Rwb[i], twb[i], delta[0:6])
                Rj, tj = res.retract_pose(Rwb[j], twb[j], delta[6:12])
                r = res.relative_pose_residual(Ri, ti, Rj, tj, Rm, tm)
                return r, r

            J, (r, _) = gn._jac_with_value(fe, 12)
            return r, J

        return jax.vmap(one)(p.edge_i, p.edge_j, p.R_meas, p.t_meas)

    def solve_once(state, lam):
        Rwb, twb = state
        r, J = residuals_and_jac(state)  # (E, 6), (E, 6, 12)
        w = p.mask.astype(dtype)
        cm_i = free[p.edge_i]
        cm_j = free[p.edge_j]
        cm = jnp.concatenate(
            [jnp.repeat(cm_i[:, None], 6, 1), jnp.repeat(cm_j[:, None], 6, 1)], axis=1
        )
        J = J * cm[:, None, :] * w[:, None, None]
        r = r * w[:, None]
        Hk = jnp.einsum("eri,erj->eij", J, J)
        bk = -jnp.einsum("eri,er->ei", J, r)

        cols_i = p.edge_i[:, None] * 6 + jnp.arange(6)[None, :]
        cols_j = p.edge_j[:, None] * 6 + jnp.arange(6)[None, :]
        cols = jnp.concatenate([cols_i, cols_j], axis=1)  # (E, 12)

        H = jnp.zeros((D, D), dtype)
        b = jnp.zeros((D,), dtype)

        def scatter(carry, ecb):
            Hc, bc = carry
            Hk_e, bk_e, col = ecb
            Hc = Hc.at[col[:, None], col[None, :]].add(Hk_e)
            bc = bc.at[col].add(bk_e)
            return (Hc, bc), None

        (H, b), _ = jax.lax.scan(scatter, (H, b), (Hk, bk, cols))
        H = H + jnp.diag(lam * jnp.ones((D,), dtype))
        diag = jnp.diagonal(H)
        H = H + jnp.diag(jnp.where(diag < 1e-10, 1.0, 0.0))
        dx = gn.solve_spd(H, b).reshape(f, 6)
        # A numerically non-PD H (f32 round-off at tiny lambda) yields NaN from
        # the pivot-free Cholesky. The LM body below rejects such steps via the
        # cost gate (NaN < cost is False), but zeroing here keeps the candidate
        # state finite so the rejected iteration costs nothing downstream.
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        Rn, tn = jax.vmap(res.retract_pose)(Rwb, twb, dx)
        return Rn, tn

    def body(carry, _):
        state, lam, nu, cost = carry
        cand = solve_once(state, lam)
        new_cost = _pose_graph_cost(p._replace(Rwb=cand[0], twb=cand[1]))
        accept = new_cost < cost
        state2 = jax.tree_util.tree_map(lambda a, b2: jnp.where(accept, a, b2), cand, state)
        return (
            state2,
            jnp.where(accept, lam / 3.0, lam * nu),
            jnp.where(accept, 2.0, nu * 2.0),
            jnp.where(accept, new_cost, cost),
        ), None

    cost0 = _pose_graph_cost(p)
    (state, _, _, _), _ = jax.lax.scan(
        body, ((p.Rwb, p.twb), 1e-5, 2.0, cost0), None, length=iterations
    )
    return p._replace(Rwb=state[0], twb=state[1])


# ---------------------------------------------------------------------------
# Visual-inertial initialization
# ---------------------------------------------------------------------------


def compute_gyr_bias(Rwb_seq, dR_seq, JRg_seq):
    """Closed-form gyro bias from rotation alignment least squares
    (``ComputeGyrBias``, g2o_optimization.cc:1136-1156): for consecutive
    frames minimize |Log(dRᵀ · Rᵢᵀ Rⱼ) − JRg·bg|²."""
    def one(Ri, Rj, dR, JRg):
        e = lie.so3_log(jnp.swapaxes(dR, -1, -2) @ jnp.swapaxes(Ri, -1, -2) @ Rj)
        return JRg.T @ JRg, JRg.T @ e

    A, bvec = jax.vmap(one)(Rwb_seq[:-1], Rwb_seq[1:], dR_seq, JRg_seq)
    H = jnp.sum(A, axis=0)
    g = jnp.sum(bvec, axis=0)
    return jnp.linalg.solve(H + 1e-12 * jnp.eye(3, dtype=H.dtype), g)


def compute_velocity(Rwb_seq, twb_seq, dP_seq, dV_seq, dT_seq, g_value):
    """Closed-form velocities + gravity from the linear system over
    preintegrated deltas (``ComputeVelocity``, g2o_optimization.cc:1171-1229).

    Unknowns: per-frame velocity (3F) + gravity vector (3). Equations per
    interval k: position and velocity preintegration constraints.
    Returns (velocities (F, 3), gravity (3,) — direction scaled to g_value).
    """
    f = Rwb_seq.shape[0]
    k = f - 1
    n = 3 * f + 3
    dtype = twb_seq.dtype

    rows = []
    rhs = []
    for i in range(k):
        Ri = Rwb_seq[i]
        # position: t_{i+1} = t_i + v_i dT + ½ g dT² + R_i dP
        A_p = jnp.zeros((3, n), dtype)
        A_p = A_p.at[:, 3 * i : 3 * i + 3].set(jnp.eye(3, dtype=dtype) * dT_seq[i])
        A_p = A_p.at[:, 3 * f : 3 * f + 3].set(0.5 * dT_seq[i] ** 2 * jnp.eye(3, dtype=dtype))
        b_p = twb_seq[i + 1] - twb_seq[i] - Ri @ dP_seq[i]
        # velocity: v_{i+1} = v_i + g dT + R_i dV
        A_v = jnp.zeros((3, n), dtype)
        A_v = A_v.at[:, 3 * i : 3 * i + 3].set(-jnp.eye(3, dtype=dtype))
        A_v = A_v.at[:, 3 * (i + 1) : 3 * (i + 1) + 3].set(jnp.eye(3, dtype=dtype))
        A_v = A_v.at[:, 3 * f : 3 * f + 3].set(-dT_seq[i] * jnp.eye(3, dtype=dtype))
        b_v = Ri @ dV_seq[i]
        rows.extend([A_p, A_v])
        rhs.extend([b_p, b_v])

    A = jnp.concatenate(rows, axis=0)
    bb = jnp.concatenate(rhs, axis=0)
    x, *_ = jnp.linalg.lstsq(A, bb)
    vels = x[: 3 * f].reshape(f, 3)
    gravity = x[3 * f :]
    return vels, gravity


@functools.partial(jax.jit, static_argnames=("iterations",))
def imu_initialization(
    Rwb,  # (F, 3, 3) fixed body poses
    twb,  # (F, 3)
    vel0,  # (F, 3) velocity seeds
    bg0,  # (3,) shared gyro-bias seed (= linearization bias of the preints)
    ba0,  # (3,) shared acc-bias seed
    Rwg0,  # (3, 3) gravity-direction seed
    preint,  # dict of stacked (F-1, …) preintegration tensors:
    #   dR, dV, dP, JRg, JVg, JVa, JPg, JPa, dT, info (9, 9)
    g_value: float,
    prior_bg,  # (3,) bias priors (frame 0's bias)
    prior_ba,
    iterations: int = 200,  # the reference's budget (g2o_optimization.cc:1027)
    info_prior_gyr: float = 1e2,  # g2o_optimization.cc:973-988
    info_prior_acc: float = 1e5,
):
    """Visual-inertial initialization GN (``IMUInitialization``,
    g2o_optimization.cc:900-1082): optimize per-frame velocities, ONE shared
    gyr/acc bias pair (with priors), and the 2-dof gravity direction, with all
    poses fixed. Returns (velocities (F, 3), bg, ba, Rwg)."""
    from airslam_tpu.backend import residuals as _res

    f = Rwb.shape[0]
    k = f - 1
    n = 3 * f + 6 + 2  # velocities | bg | ba | gravity tangent
    dtype = twb.dtype

    def residuals(x):
        vels = x[: 3 * f].reshape(f, 3)
        bg = x[3 * f: 3 * f + 3]
        ba = x[3 * f + 3: 3 * f + 6]
        Rwg = Rwg0 @ lie.so3_exp(jnp.concatenate([x[3 * f + 6:], jnp.zeros(1, dtype)]))

        def one(i):
            return _res.imu_residual(
                Rwb[i], twb[i], vels[i],
                Rwb[i + 1], twb[i + 1], vels[i + 1],
                bg, ba,
                preint["dR"][i], preint["dV"][i], preint["dP"][i],
                preint["JRg"][i], preint["JVg"][i], preint["JVa"][i],
                preint["JPg"][i], preint["JPa"][i],
                bg0, ba0, preint["dT"][i], Rwg, g_value,
            )

        r = jax.vmap(one)(jnp.arange(k))  # (K, 9)
        return r, bg - prior_bg, ba - prior_ba

    def cost(x):
        r, rbg, rba = residuals(x)
        c = jnp.einsum("ki,kij,kj->", r, preint["info"], r)
        return c + info_prior_gyr * rbg @ rbg + info_prior_acc * rba @ rba

    def solve(x, lam):
        J = jax.jacfwd(lambda y: residuals(y)[0])(x)  # (K, 9, n)
        r, rbg, rba = residuals(x)
        JtW = jnp.einsum("krc,krs->ksc", J, preint["info"])
        H = jnp.einsum("ksc,ksd->cd", JtW, J)
        b = -jnp.einsum("ksc,ks->c", JtW, r)
        # bias priors
        H = H.at[3 * f: 3 * f + 3, 3 * f: 3 * f + 3].add(info_prior_gyr * jnp.eye(3, dtype=dtype))
        H = H.at[3 * f + 3: 3 * f + 6, 3 * f + 3: 3 * f + 6].add(info_prior_acc * jnp.eye(3, dtype=dtype))
        b = b.at[3 * f: 3 * f + 3].add(-info_prior_gyr * rbg)
        b = b.at[3 * f + 3: 3 * f + 6].add(-info_prior_acc * rba)
        H = H + lam * jnp.eye(n, dtype=dtype)
        dx = gn.solve_spd(H, b)
        # NaN-safe: the LM cost gate in body() rejects non-finite candidates,
        # and zeroing keeps the candidate state itself finite (advisor r4).
        return x + jnp.where(jnp.isfinite(dx), dx, 0.0)

    def body(carry, _):
        x, lam, nu, c = carry
        cand = solve(x, lam)
        c2 = cost(cand)
        accept = c2 < c
        x2 = jnp.where(accept, cand, x)
        return (
            x2,
            jnp.where(accept, lam / 3.0, lam * nu),
            jnp.where(accept, 2.0, nu * 2.0),
            jnp.where(accept, c2, c),
        ), None

    x0 = jnp.concatenate([vel0.reshape(-1), bg0, ba0, jnp.zeros(2, dtype)])
    (x, _, _, _), _ = jax.lax.scan(body, (x0, 1e-4, 2.0, cost(x0)), None, length=iterations)

    vels = x[: 3 * f].reshape(f, 3)
    bg = x[3 * f: 3 * f + 3]
    ba = x[3 * f + 3: 3 * f + 6]
    Rwg = Rwg0 @ lie.so3_exp(jnp.concatenate([x[3 * f + 6:], jnp.zeros(1, dtype)]))
    return vels, bg, ba, Rwg


def gravity_to_rwg(gravity, dtype=jnp.float64):
    """Rotation aligning the world z-down gravity to the estimated gravity
    direction (the Rwg convention of VertexGDirection / map.cc:1168-1200)."""
    gI = jnp.asarray([0.0, 0.0, -1.0], dtype)
    gn_ = gravity / jnp.linalg.norm(gravity)
    v = jnp.cross(gI, gn_)
    s = jnp.linalg.norm(v)
    c = jnp.dot(gI, gn_)
    vhat = lie.hat(v)
    R = jnp.eye(3, dtype=dtype) + vhat + vhat @ vhat * ((1 - c) / jnp.maximum(s * s, 1e-12))
    return jnp.where(s < 1e-8, jnp.eye(3, dtype=dtype), R)

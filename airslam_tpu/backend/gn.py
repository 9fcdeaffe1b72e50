"""Batched Levenberg-Marquardt bundle adjustment with Schur-complement
elimination — the TPU-native replacement for g2o's sparse optimizer
(``LocalmapOptimization``/``GlobalBA``/``FrameOptimization`` in
src/g2o_optimization/g2o_optimization.cc).

TPU-first formulation
---------------------
g2o builds an incremental sparse graph and factorizes with CHOLMOD-style
solvers — pointer-chasing that maps terribly to an MXU. Here the problem is a
*dense fixed-shape grid*:

- observations live on (landmark, frame) grids — each landmark is observed at
  most once per frame, so a (P, F) boolean mask fully describes the topology;
- per-observation Jacobians come from ``vmap(jacfwd)`` over the grid (exact,
  batched — the reference uses per-edge numeric differentiation);
- landmark blocks (3×3 points / 4×4 lines) are inverted in closed form in one
  batched op, and the Schur complement is a handful of einsums;
- the reduced camera system (≤ F·15+2 dims for a sliding window) is solved
  *dense* — at these sizes a dense Cholesky on the MXU beats any sparse
  factorization;
- fixed vertices are handled by masking their Jacobian columns and pinning
  the diagonal, so one compiled program serves every fix pattern.

LM damping/accept logic follows g2o's Levenberg strategy (gain-ratio ρ,
λ ← λ·max(⅓, 1−(2ρ−1)³) on accept, λ ← λ·ν, ν ← 2ν on reject).

Robust weighting: Huber with δ² = the chi² threshold (δ = sqrt(cfg.*)), as in
g2o_optimization.cc:200-276; the chi²-gating schedule (optimize(5) → drop
outlier obs → optimize(15)) is driven by :mod:`airslam_tpu.backend.windows`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from airslam_tpu.backend import residuals as res
from airslam_tpu.core import lie

POSE_DIM = 6
# Smallest |det| admitted by the closed-form block inverses; ~1e-30 is far
# below any legitimate damped-SPD determinant (λ floor ≥ 1e-5 ⇒ det ≥ 1e-15)
# yet keeps 1/det finite in f32's subnormal range.
_DET_FLOOR = 1e-30
VEL_DIM = 3
BIAS_DIM = 6
FRAME_DIM = POSE_DIM + VEL_DIM + BIAS_DIM  # 15
GRAV_DIM = 2


class FrameStates(NamedTuple):
    Rwb: jax.Array  # (F, 3, 3)
    twb: jax.Array  # (F, 3)
    vel: jax.Array  # (F, 3)
    bg: jax.Array  # (F, 3)
    ba: jax.Array  # (F, 3)


class IMUFactors(NamedTuple):
    """K preintegration factors; factor k links frames idx_i[k] → idx_j[k]."""

    idx_i: jax.Array  # (K,) int32
    idx_j: jax.Array  # (K,)
    dR: jax.Array  # (K, 3, 3)
    dV: jax.Array  # (K, 3)
    dP: jax.Array  # (K, 3)
    JRg: jax.Array  # (K, 3, 3)
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    bg_lin: jax.Array  # (K, 3) linearization gyro bias
    ba_lin: jax.Array  # (K, 3)
    dT: jax.Array  # (K,)
    info: jax.Array  # (K, 9, 9) PSD-projected inverse preintegration covariance
    info_walk: jax.Array  # (K, 6, 6) bias random-walk information (gyr then acc)
    mask: jax.Array  # (K,) bool


class BAProblem(NamedTuple):
    frames: FrameStates
    pose_fixed: jax.Array  # (F,) bool
    vel_fixed: jax.Array  # (F,) bool (velocity + biases)
    points: jax.Array  # (P, 3)
    point_fixed: jax.Array  # (P,) bool
    point_obs: jax.Array  # (P, F, 3) — (u, v, u_r); u_r < 0 ⇒ mono
    point_obs_mask: jax.Array  # (P, F) bool
    lines: jax.Array  # (L, 6) Plücker (w, d)
    line_fixed: jax.Array  # (L,) bool
    line_obs: jax.Array  # (L, F, 8)
    line_obs_stereo: jax.Array  # (L, F) bool
    line_obs_mask: jax.Array  # (L, F) bool
    line_obs_sigma: jax.Array  # (L, F) information scale (pixel_sigma,
    # map.cc:724: 0.1 for >3 observers else 0.001; tracking uses cfg rate)
    Rwg: jax.Array  # (3, 3) gravity direction
    gravity_free: jax.Array  # () float — 1.0 optimizes gravity, 0.0 pins it
    imu: Optional[IMUFactors]
    # camera
    Rcb: jax.Array  # (3, 3)
    tcb: jax.Array  # (3,)
    # gravity magnitude (camera.cc g_value). A pytree leaf so two problems
    # with different g coexist in one process (no module-global state).
    g_value: jax.Array = 9.81


class BAConfig(NamedTuple):
    """Chi² thresholds (OptimizationConfig, read_configs.h / vo_euroc.yaml)."""

    mono_point: float = 50.0
    stereo_point: float = 75.0
    mono_line: float = 50.0
    stereo_line: float = 75.0
    line_sigma: float = 0.5  # pixel_sigma information scale ("rate" in cfg)
    imu_info_scale: float = 1e-2  # g2o_optimization.cc:321


# ---------------------------------------------------------------------------
# residual/jacobian evaluation over the dense grids
# ---------------------------------------------------------------------------


def _point_grid_residuals(problem: BAProblem, intr, with_jac: bool):
    """Returns r (P,F,3), row_mask (P,F,3), depth_ok (P,F) and optionally
    Jc (P,F,3,6), Jp (P,F,3,3)."""
    fr = problem.frames

    def one(Rwb, twb, point, obs):
        def f(delta):
            R2, t2 = res.retract_pose(Rwb, twb, delta[0:6])
            Rcw, tcw = res.pose_to_camera(R2, t2, problem.Rcb, problem.tcb)
            r, z = res.point_residual(Rcw, tcw, point + delta[6:9], obs, intr)
            return r, z

        if with_jac:
            J, (r, z) = _jac_with_value(f, 9, problem.points.dtype)
            return r, z, J[:, 0:6], J[:, 6:9]
        r, z = f(jnp.zeros((9,), problem.points.dtype))
        return r, z, None, None

    def over_frames(point, obs_row):
        return jax.vmap(lambda R, t, o: one(R, t, point, o))(fr.Rwb, fr.twb, obs_row)

    r, z, Jc, Jp = jax.vmap(over_frames)(problem.points, problem.point_obs)
    is_stereo = problem.point_obs[..., 2] >= 0
    row_mask = jnp.stack(
        [
            problem.point_obs_mask,
            problem.point_obs_mask,
            problem.point_obs_mask & is_stereo,
        ],
        axis=-1,
    ).astype(r.dtype)
    return r, row_mask, z > 0, Jc, Jp


def _jac_with_value(f, n, dtype=None):
    """Forward-mode Jacobian at zero + primal value, for f: (n,) -> (out, aux).

    ``dtype`` types the tangent seed: an untyped (default-f64-under-x64) seed
    promotes every residual/Jacobian grid of an f32 problem to f64 inside an
    x64 host process."""
    zero = jnp.zeros((n,), dtype)

    def split(delta):
        out = f(delta)
        return out[0], out

    J, out = jax.jacfwd(split, has_aux=True)(zero)
    return J, out


def _line_grid_residuals(problem: BAProblem, intr, with_jac: bool):
    fr = problem.frames

    def one(Rwb, twb, line, obs):
        def f(delta):
            R2, t2 = res.retract_pose(Rwb, twb, delta[0:6])
            Rcw, tcw = res.pose_to_camera(R2, t2, problem.Rcb, problem.tcb)
            line2 = lie.line_orthonormal_oplus(line, delta[6:10])
            r = res.line_residual(Rcw, tcw, line2, obs, intr)
            return r, r

        if with_jac:
            J, (r, _) = _jac_with_value(f, 10, problem.lines.dtype)
            return r, J[:, 0:6], J[:, 6:10]
        r, _ = f(jnp.zeros((10,), problem.lines.dtype))
        return r, None, None

    def over_frames(line, obs_row):
        return jax.vmap(lambda R, t, o: one(R, t, line, o))(fr.Rwb, fr.twb, obs_row)

    r, Jc, Jl = jax.vmap(over_frames)(problem.lines, problem.line_obs)
    row_mask = jnp.stack(
        [
            problem.line_obs_mask,
            problem.line_obs_mask,
            problem.line_obs_mask & problem.line_obs_stereo,
            problem.line_obs_mask & problem.line_obs_stereo,
        ],
        axis=-1,
    ).astype(r.dtype)
    return r, row_mask, Jc, Jl


def _imu_residuals(problem: BAProblem, with_jac: bool):
    return imu_residuals(problem.frames, problem.imu, problem.Rwg, with_jac,
                         problem.g_value)


def imu_residuals(fr: FrameStates, imu: IMUFactors, Rwg, with_jac: bool,
                  g_value=9.81):
    """Residuals/Jacobians for IMU factors (shared by the dense window solver
    and the sparse map-scale solver in backend/global_ba.py). Delta layout per
    factor: (frame_i 15 | frame_j 15 | gravity 2) = 32."""

    def one(k):
        i = imu.idx_i[k]
        j = imu.idx_j[k]
        Ri, ti, vi = fr.Rwb[i], fr.twb[i], fr.vel[i]
        Rj, tj, vj = fr.Rwb[j], fr.twb[j], fr.vel[j]
        bgj, baj = fr.bg[j], fr.ba[j]
        bgi, bai = fr.bg[i], fr.ba[i]

        def f(delta):
            di, dj, dg = delta[0:15], delta[15:30], delta[30:32]
            Ri2, ti2 = res.retract_pose(Ri, ti, di[0:6])
            Rj2, tj2 = res.retract_pose(Rj, tj, dj[0:6])
            vi2 = vi + di[6:9]
            vj2 = vj + dj[6:9]
            bgj2 = bgj + dj[9:12]
            baj2 = baj + dj[12:15]
            Rwg2 = Rwg @ lie.so3_exp(jnp.concatenate([dg, jnp.zeros(1, dg.dtype)]))
            r9 = res.imu_residual(
                Ri2, ti2, vi2, Rj2, tj2, vj2, bgj2, baj2,
                imu.dR[k], imu.dV[k], imu.dP[k],
                imu.JRg[k], imu.JVg[k], imu.JVa[k], imu.JPg[k], imu.JPa[k],
                imu.bg_lin[k], imu.ba_lin[k], imu.dT[k], Rwg2, g_value,
            )
            # bias random walk: bg_j − bg_i, ba_j − ba_i (EdgeGyr/EdgeAcc)
            rw = jnp.concatenate(
                [bgj2 - (bgi + di[9:12]), baj2 - (bai + di[12:15])]
            )
            r = jnp.concatenate([r9, rw])
            return r, r

        if with_jac:
            J, (r, _) = _jac_with_value(f, 32, fr.twb.dtype)
            return r, J
        r, _ = f(jnp.zeros((32,), fr.twb.dtype))
        return r, None

    ks = jnp.arange(imu.idx_i.shape[0])
    return jax.vmap(one)(ks)


# ---------------------------------------------------------------------------
# chi² and robust cost
# ---------------------------------------------------------------------------


def point_chi2(problem: BAProblem, intr):
    """Per-observation chi² (P, F) + depth-positive flag, for gating/inliers
    (mono: 2 rows, stereo: 3 — matches e->chi2() with identity information)."""
    r, row_mask, depth_ok, _, _ = _point_grid_residuals(problem, intr, with_jac=False)
    chi2 = jnp.sum(r * r * row_mask, axis=-1)
    return chi2, depth_ok


def line_chi2(problem: BAProblem, intr, sigma=None):
    """Per-observation chi² with the per-obs information scale
    (``sigma`` overrides; default = problem.line_obs_sigma)."""
    r, row_mask, _, _ = _line_grid_residuals(problem, intr, with_jac=False)
    s = problem.line_obs_sigma if sigma is None else sigma
    return jnp.sum(r * r * row_mask, axis=-1) * s


def inv3_spd(A):
    """Batched closed-form (adjugate) inverse of (..., 3, 3) SPD blocks.

    ``jnp.linalg.inv`` lowers every tiny block to an LU While-loop on TPU;
    for the damped Schur landmark blocks (P×3×3, L×4×4 via :func:`inv4_spd`)
    the cofactor formula is exact, branch-free, and fuses into elementwise
    vector ops. Blocks are SPD by construction (JᵀWJ + λI), so no pivoting
    concern exists in the first place."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    # Floor |det| away from zero: a block that passes the trace pinning but is
    # near-singular under tiny LM damping would otherwise produce inf/NaN in
    # f32 and poison the Schur complement (advisor r4). sign(0) → +tiny.
    det = jnp.where(det >= 0, jnp.maximum(det, _DET_FLOOR),
                    jnp.minimum(det, -_DET_FLOOR))
    inv = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c10, c11, c12], axis=-1),
        jnp.stack([c20, c21, c22], axis=-1),
    ], axis=-2)
    return inv / det[..., None, None]


def _inv2(A):
    det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    det = jnp.where(det >= 0, jnp.maximum(det, _DET_FLOOR),
                    jnp.minimum(det, -_DET_FLOOR))
    inv = jnp.stack([
        jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1),
        jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1),
    ], axis=-2)
    return inv / det[..., None, None]


def inv4_spd(A):
    """Batched (..., 4, 4) SPD inverse via 2×2 block inversion (Schur on the
    trailing 2×2) with closed-form 2×2 inverses — see :func:`inv3_spd` for
    why not ``jnp.linalg.inv``."""
    P = A[..., :2, :2]
    Q = A[..., :2, 2:]
    R = A[..., 2:, 2:]
    Pi = _inv2(P)
    PiQ = Pi @ Q
    S = R - jnp.swapaxes(Q, -1, -2) @ PiQ
    Si = _inv2(S)
    TL = Pi + PiQ @ Si @ jnp.swapaxes(PiQ, -1, -2)
    TR = -PiQ @ Si
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(TR, -1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def solve_spd(H, b):
    """Solve ``H x = b`` for a symmetric positive-definite ``H`` (any static
    size) via Cholesky + two triangular solves.

    ``jnp.linalg.solve`` lowers to LU with PARTIAL PIVOTING — a serial
    row-swap While loop whose latency dominates the reduced-system solve of
    every LM iteration on TPU (the local-BA window's damped Schur complement
    is 227×227: 15 frames × 15 dof + 2 gravity dofs). XLA's Cholesky is
    blocked and pivot-free; the damped LM Hessian is SPD by construction
    (JᵀWJ + λI, λ > 0, fixed rows pinned to 1)."""
    L = jax.lax.linalg.cholesky((H + jnp.swapaxes(H, -1, -2)) * 0.5)
    y = jax.lax.linalg.triangular_solve(
        L, b[..., None], left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True)
    return x[..., 0]


def solve_spd_small(H, b):
    """Solve ``H x = b`` for a small (static n ≤ ~16) symmetric
    positive-definite ``H`` via a fully unrolled Cholesky factorization.

    ``jnp.linalg.solve`` lowers to LU with partial pivoting — on TPU a
    serial While loop of dynamic-slice/update steps whose fixed latency
    dominates each LM iteration of the tiny tracking systems (6×6 vision,
    15×15 VI). The damped LM Hessian is SPD by construction (JᵀWJ + λI with
    λ > 0), so Cholesky needs no pivoting and the unrolled form fuses into
    straight-line vector ops. Exact (not approximate): same O(n³/6)
    arithmetic as LAPACK potrf/potrs, just statically scheduled.
    """
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            t = H[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv
    y = [None] * n  # forward: L y = b
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n  # back: Lᵀ x = y
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _huber_cost(chi2, delta2, active):
    lin = 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
    return jnp.sum(jnp.where(active, jnp.where(chi2 <= delta2, chi2, lin), 0.0))


def total_cost(problem: BAProblem, intr, cfg: BAConfig, robust: bool):
    pchi2, _ = point_chi2(problem, intr)
    is_stereo = problem.point_obs[..., 2] >= 0
    pthr = jnp.where(is_stereo, cfg.stereo_point, cfg.mono_point)
    active_p = problem.point_obs_mask
    lchi2 = line_chi2(problem, intr)
    lthr = jnp.where(problem.line_obs_stereo, cfg.stereo_line, cfg.mono_line)
    active_l = problem.line_obs_mask
    if robust:
        cost = _huber_cost(pchi2, pthr, active_p) + _huber_cost(lchi2, lthr, active_l)
    else:
        cost = jnp.sum(jnp.where(active_p, pchi2, 0.0)) + jnp.sum(
            jnp.where(active_l, lchi2, 0.0)
        )
    if problem.imu is not None:
        r, _ = _imu_residuals(problem, with_jac=False)
        r9, rw = r[:, :9], r[:, 9:]
        info9 = problem.imu.info * cfg.imu_info_scale
        c_imu = jnp.einsum("ki,kij,kj->k", r9, info9, r9)
        c_walk = jnp.einsum("ki,kij,kj->k", rw, problem.imu.info_walk, rw)
        if robust:
            # Huber delta² = 16.92 on the 9-d residual (g2o_optimization.cc:321)
            cost = cost + _huber_cost(c_imu, 16.92, problem.imu.mask)
        else:
            cost = cost + jnp.sum(jnp.where(problem.imu.mask, c_imu, 0.0))
        cost = cost + jnp.sum(jnp.where(problem.imu.mask, c_walk, 0.0))
    return cost


# ---------------------------------------------------------------------------
# normal equations assembly + Schur solve
# ---------------------------------------------------------------------------


def _assemble_and_solve(problem: BAProblem, intr, cfg: BAConfig, lam, robust: bool):
    """One damped LM solve. Returns (dx_frames (F,15), dRwg tangent (2,),
    dpoints (P,3), dlines (L,4))."""
    f = problem.frames.Rwb.shape[0]
    p = problem.points.shape[0]
    l = problem.lines.shape[0]
    # Vision-only problems: velocity/bias rows are touched ONLY by IMU
    # factors. Without them those 9 of every 15 per-frame dims are all-zero
    # rows that the damping pins to identity with dx = 0 — solving them is
    # pure waste. Build the reduced pose-only system instead (F=15 window:
    # 227×227 → 92×92, ~15× fewer Cholesky FLOPs and a 2.4× smaller H
    # assembly); exact, since the dropped rows/cols carry no coupling.
    # ``problem.imu is None`` is static under jit (pytree structure).
    imu_on = problem.imu is not None
    stride = FRAME_DIM if imu_on else POSE_DIM
    D = f * stride + GRAV_DIM
    dtype = problem.points.dtype

    # NOTE on contraction style: every landmark-family contraction below is
    # written as broadcast-multiply-reduce instead of einsum. The
    # contractions are tiny (residual rows r=3/4, dof 3/4/6) and batched over
    # (P, F); einsum lowers them to dot_general custom calls whose operand
    # layout requirements materialize ~1.5 ms/window of pure relayout copies
    # (measured per-HLO-op, scripts/trace_local_ba.py). The broadcast forms
    # stay in loop/reduce fusions on the VPU with no layout changes.

    # -- points ------------------------------------------------------------
    r, row_mask, depth_ok, Jc, Jp = _point_grid_residuals(problem, intr, True)
    is_stereo = problem.point_obs[..., 2] >= 0
    thr = jnp.where(is_stereo, cfg.stereo_point, cfg.mono_point)
    chi2 = jnp.sum(r * r * row_mask, axis=-1)
    w = res.huber_weight(chi2, thr) if robust else jnp.ones_like(chi2)
    w = w * problem.point_obs_mask
    # zero out fixed-pose columns / fixed-point columns
    pose_free = (~problem.pose_fixed).astype(dtype)  # (F,)
    Jc = Jc * row_mask[..., None] * pose_free[None, :, None, None]
    point_free = ((~problem.point_fixed)).astype(dtype)
    Jp = Jp * row_mask[..., None] * point_free[:, None, None, None]
    rw = r * row_mask
    wJc = Jc * w[..., None, None]  # (P, F, 3, 6)
    wJp = Jp * w[..., None, None]  # (P, F, 3, 3)

    Hcc_pt = jnp.sum(wJc[..., :, None] * Jc[..., None, :], axis=(0, 2))
    bc_pt = -jnp.sum(wJc * rw[..., None], axis=(0, 2))
    Hpp = jnp.sum(wJp[..., :, None] * Jp[..., None, :], axis=(1, 2))
    bp = -jnp.sum(wJp * rw[..., None], axis=(1, 2))
    Wcp = jnp.sum(wJc[..., :, None] * Jp[..., None, :], axis=2)  # (P,F,6,3)

    # -- lines -------------------------------------------------------------
    lr, lrow_mask, LJc, LJl = _line_grid_residuals(problem, intr, True)
    lthr = jnp.where(problem.line_obs_stereo, cfg.stereo_line, cfg.mono_line)
    lchi2 = jnp.sum(lr * lr * lrow_mask, axis=-1) * problem.line_obs_sigma
    lw = res.huber_weight(lchi2, lthr) if robust else jnp.ones_like(lchi2)
    lw = lw * problem.line_obs_mask * problem.line_obs_sigma
    LJc = LJc * lrow_mask[..., None] * pose_free[None, :, None, None]
    line_free = ((~problem.line_fixed)).astype(dtype)
    LJl = LJl * lrow_mask[..., None] * line_free[:, None, None, None]
    lrw = lr * lrow_mask
    wLJc = LJc * lw[..., None, None]  # (L, F, 4, 6)
    wLJl = LJl * lw[..., None, None]  # (L, F, 4, 4)

    Hcc_ln = jnp.sum(wLJc[..., :, None] * LJc[..., None, :], axis=(0, 2))
    bc_ln = -jnp.sum(wLJc * lrw[..., None], axis=(0, 2))
    Hll = jnp.sum(wLJl[..., :, None] * LJl[..., None, :], axis=(1, 2))
    bl = -jnp.sum(wLJl * lrw[..., None], axis=(1, 2))
    Wcl = jnp.sum(wLJc[..., :, None] * LJl[..., None, :], axis=2)  # (L,F,6,4)

    Hcc = Hcc_pt + Hcc_ln  # (F, 6, 6)
    bc = bc_pt + bc_ln

    if imu_on:
        # VI system in BLOCK layout: (F, 15, F, 15) frame blocks + a 2-dof
        # gravity border, assembled with static slices and one-hot
        # contractions ONLY. The previous form scattered into the dense
        # (227, 227) H (jnp.ix_ for the pose diagonal + one batched
        # (K, 32, 32) factor scatter); per-HLO-op tracing on the chip put
        # ~160 µs of every LM iteration in those scatters and their
        # relayouts — over half the VI window (scripts/trace_local_ba.py
        # --vi, round 5). g2o builds the same sparse block structure
        # incrementally (g2o_optimization.cc:187-332); here the block grid
        # IS the static shape.
        Hff = jnp.zeros((f, FRAME_DIM, f, FRAME_DIM), dtype)
        bf = jnp.zeros((f, FRAME_DIM), dtype)
        eye_f = jnp.eye(f, dtype=dtype)
        Hff = Hff.at[:, :POSE_DIM, :, :POSE_DIM].add(
            jnp.einsum("fg,fab->fagb", eye_f, Hcc))
        bf = bf.at[:, :POSE_DIM].add(bc)

    # -- IMU ---------------------------------------------------------------
    if problem.imu is not None:
        ir, iJ = _imu_residuals(problem, True)  # (K, 15), (K, 15, 32)
        imu = problem.imu
        info9 = imu.info * cfg.imu_info_scale
        if robust:
            c_imu = jnp.einsum("ki,kij,kj->k", ir[:, :9], info9, ir[:, :9])
            wi = res.huber_weight(c_imu, jnp.full_like(c_imu, 16.92))
        else:
            wi = jnp.ones((ir.shape[0],), dtype)
        wi = wi * imu.mask

        # information for all 15 residual rows: blockdiag(info9*w, info_walk)
        big_info = jnp.zeros((ir.shape[0], 15, 15), dtype)
        big_info = big_info.at[:, :9, :9].set(info9 * wi[:, None, None])
        big_info = big_info.at[:, 9:15, 9:15].set(
            imu.info_walk * imu.mask[:, None, None].astype(dtype)
        )

        # column masks: fixed frames / fixed vel+bias / fixed gravity
        def col_mask_for(idx):
            pf = (~problem.pose_fixed[idx]).astype(dtype)
            vf = (~problem.vel_fixed[idx]).astype(dtype)
            return jnp.concatenate(
                [jnp.full((6,), 1.0) * pf, jnp.full((9,), 1.0) * vf]
            )

        cm_i = jax.vmap(col_mask_for)(imu.idx_i)  # (K, 15)
        cm_j = jax.vmap(col_mask_for)(imu.idx_j)
        g_free = problem.gravity_free
        cm = jnp.concatenate(
            [cm_i, cm_j, jnp.broadcast_to(g_free, (ir.shape[0], 2))], axis=1
        )
        iJ = iJ * cm[:, None, :]

        JtW = jnp.einsum("krc,krs->ksc", iJ, big_info)  # (K, 15, 32)
        Hk = jnp.einsum("ksc,ksd->kcd", JtW, iJ)  # (K, 32, 32)
        bk = -jnp.einsum("ksc,ks->kc", JtW, ir)  # (K, 32)

        # accumulate each factor's 15/15/2 sub-blocks into the block grid via
        # one-hot contractions (no scatter — see the block-layout NOTE above)
        FD = FRAME_DIM
        oh_i = jax.nn.one_hot(imu.idx_i, f, dtype=dtype)  # (K, F)
        oh_j = jax.nn.one_hot(imu.idx_j, f, dtype=dtype)
        Hii, Hij = Hk[:, :FD, :FD], Hk[:, :FD, FD:2 * FD]
        Hjj = Hk[:, FD:2 * FD, FD:2 * FD]
        # Hk is symmetric (JᵀWJ with symmetric W), so the (j,i) placement is
        # the transpose of the (i,j) one
        Tij = jnp.einsum("kf,kab,kg->fagb", oh_i, Hij, oh_j)
        Hff = Hff + (
            jnp.einsum("kf,kab,kg->fagb", oh_i, Hii, oh_i)
            + Tij + Tij.transpose(2, 3, 0, 1)
            + jnp.einsum("kf,kab,kg->fagb", oh_j, Hjj, oh_j)
        )
        Hfg = (jnp.einsum("kf,kac->fac", oh_i, Hk[:, :FD, 2 * FD:])
               + jnp.einsum("kf,kac->fac", oh_j, Hk[:, FD:2 * FD, 2 * FD:]))
        Hgg = jnp.sum(Hk[:, 2 * FD:, 2 * FD:], axis=0)
        bf = bf + (jnp.einsum("kf,ka->fa", oh_i, bk[:, :FD])
                   + jnp.einsum("kf,ka->fa", oh_j, bk[:, FD:2 * FD]))
        bg_grav = jnp.sum(bk[:, 2 * FD:], axis=0)

    # -- landmark-block damping + closed-form inverses ---------------------
    Hpp_d = Hpp + lam * jnp.eye(3, dtype=dtype)[None]
    Hpp_d = Hpp_d + jnp.eye(3, dtype=dtype)[None] * (
        (jnp.einsum("pii->p", Hpp) < 1e-10).astype(dtype)[:, None, None]
    )
    Hll_d = Hll + lam * jnp.eye(4, dtype=dtype)[None]
    Hll_d = Hll_d + jnp.eye(4, dtype=dtype)[None] * (
        (jnp.einsum("lii->l", Hll) < 1e-10).astype(dtype)[:, None, None]
    )

    Hpp_inv = inv3_spd(Hpp_d)
    Hll_inv = inv4_spd(Hll_d)

    # -- Schur complement onto the pose rows -------------------------------
    # Y = W · Hinv per landmark (broadcast-reduce, see NOTE above), then ONE
    # real contraction per family over (landmark, landmark-dof) — the only
    # matmul-shaped op in the assembly.
    Y = jnp.sum(Wcp[..., :, None] * Hpp_inv[:, None, None, :, :], axis=3)
    Yl = jnp.sum(Wcl[..., :, None] * Hll_inv[:, None, None, :, :], axis=3)
    S_big6 = (jnp.einsum("pfac,pgdc->fagd", Y, Wcp).reshape(
        f * POSE_DIM, f * POSE_DIM)
        + jnp.einsum("lfac,lgdc->fagd", Yl, Wcl).reshape(
            f * POSE_DIM, f * POSE_DIM))
    bs = (jnp.sum(Y * bp[:, None, None, :], axis=(0, 3))
          + jnp.sum(Yl * bl[:, None, None, :], axis=(0, 3)))  # (F, 6)

    if imu_on:
        # fold the landmark Schur complement into the pose sub-blocks (static
        # slice — the block layout makes _expand_pose_blocks' scatter moot)
        Hff = Hff.at[:, :POSE_DIM, :, :POSE_DIM].add(
            -S_big6.reshape(f, POSE_DIM, f, POSE_DIM))
        bf = bf.at[:, :POSE_DIM].add(-bs)
        # densify (pure layout) + gravity border, then damping + pinning
        Hd = Hff.reshape(f * FRAME_DIM, f * FRAME_DIM)
        Hfg2 = Hfg.reshape(f * FRAME_DIM, GRAV_DIM)
        H = jnp.concatenate(
            [jnp.concatenate([Hd, Hfg2], axis=1),
             jnp.concatenate([Hfg2.T, Hgg], axis=1)], axis=0)
        b = jnp.concatenate([bf.reshape(-1), bg_grav])
        H = H + jnp.diag(lam * jnp.ones((D,), dtype))
        diag = jnp.diagonal(H)
        H = H + jnp.diag(jnp.where(diag < 1e-10, 1.0, 0.0))
        dx = solve_spd(H, b)
        dx_frames = dx[: f * FRAME_DIM].reshape(f, FRAME_DIM)
        dg = dx[f * stride:]
        dxc = dx_frames[:, :POSE_DIM]
    else:
        # vision-only: gravity has no gradient (it enters only through IMU
        # factors) and vel/bias dims were never in the system — the reduced
        # system is exactly the leading F·6 pose block, assembled with
        # static slices (no scatter).
        Htop = _blockdiag(Hcc) - S_big6
        Htop = Htop + jnp.diag(lam * jnp.ones((f * POSE_DIM,), dtype))
        diag = jnp.diagonal(Htop)
        Htop = Htop + jnp.diag(jnp.where(diag < 1e-10, 1.0, 0.0))
        dxp = solve_spd(Htop, (bc - bs).reshape(-1))
        dxc = dxp.reshape(f, POSE_DIM)
        dx_frames = (jnp.zeros((f, FRAME_DIM), dtype)
                     .at[:, :POSE_DIM].set(dxc))
        dg = jnp.zeros((GRAV_DIM,), dtype)

    # -- back-substitute landmarks ----------------------------------------
    gp = bp - jnp.sum(Wcp * dxc[None, :, :, None], axis=(1, 2))  # (P, 3)
    gl = bl - jnp.sum(Wcl * dxc[None, :, :, None], axis=(1, 2))  # (L, 4)
    dp = jnp.sum(Hpp_inv * gp[:, None, :], axis=2)
    dl = jnp.sum(Hll_inv * gl[:, None, :], axis=2)
    return dx_frames, dg, dp, dl


def _blockdiag(blocks):
    """(F, k, k) -> (F*k, F*k) block-diagonal."""
    f, k, _ = blocks.shape
    eye = jnp.eye(f, dtype=blocks.dtype)
    return jnp.einsum("fg,fij->figj", eye, blocks).reshape(f * k, f * k)


def apply_update(problem: BAProblem, dx_frames, dg, dp, dl) -> BAProblem:
    fr = problem.frames
    Rwb, twb = jax.vmap(res.retract_pose)(fr.Rwb, fr.twb, dx_frames[:, 0:6])
    new_frames = FrameStates(
        Rwb=Rwb,
        twb=twb,
        vel=fr.vel + dx_frames[:, 6:9],
        bg=fr.bg + dx_frames[:, 9:12],
        ba=fr.ba + dx_frames[:, 12:15],
    )
    dg_eff = dg * problem.gravity_free
    Rwg = problem.Rwg @ lie.so3_exp(jnp.concatenate([dg_eff, jnp.zeros(1, dg.dtype)]))
    new_lines = jax.vmap(lie.line_orthonormal_oplus)(problem.lines, dl)
    return problem._replace(
        frames=new_frames,
        points=problem.points + dp,
        lines=new_lines,
        Rwg=Rwg,
    )


# ---------------------------------------------------------------------------
# LM driver
# ---------------------------------------------------------------------------


def optimize(
    problem: BAProblem,
    intr,
    cfg: BAConfig,
    iterations: int,
    robust: bool = True,
    tau: float = 1e-5,
    early_exit: float = 0.0,
) -> BAProblem:
    """Run ``iterations`` LM steps (g2o Levenberg strategy) and return the
    updated problem. Jit-able; call under jax.jit for production.

    ``early_exit`` (static, opt-in — deviates from g2o's fixed schedule):
    when > 0, stop once an accepted step improves the cost by less than
    ``early_exit`` relative (lax.while_loop instead of the fixed-length
    scan). 0.0 keeps exact reference-parity iteration counts."""

    cost0 = total_cost(problem, intr, cfg, robust)
    lam0 = tau * 100.0  # g2o: tau * max(diag(H)); diag ~O(1e2) for pixel terms

    def with_state(state):
        frames, points, lines, Rwg = state
        return problem._replace(frames=frames, points=points, lines=lines, Rwg=Rwg)

    def step(state, lam, nu, cost):
        prob = with_state(state)
        dxf, dg, dp, dl = _assemble_and_solve(prob, intr, cfg, lam, robust)
        cand = apply_update(prob, dxf, dg, dp, dl)
        new_cost = total_cost(cand, intr, cfg, robust)
        accept = new_cost < cost

        cand_state = (cand.frames, cand.points, cand.lines, cand.Rwg)
        state2 = jax.tree_util.tree_map(
            lambda a, b2: jnp.where(accept, a, b2), cand_state, state
        )
        # g2o-style damping adaptation (simplified gain ratio)
        lam2 = jnp.where(accept, lam / 3.0, lam * nu)
        nu2 = jnp.where(accept, 2.0, nu * 2.0)
        cost2 = jnp.where(accept, new_cost, cost)
        return state2, lam2, nu2, cost2, accept, new_cost

    state0 = (problem.frames, problem.points, problem.lines, problem.Rwg)

    if early_exit > 0.0:
        def cond(carry):
            _, _, _, _, it, done = carry
            return (it < iterations) & ~done

        def wbody(carry):
            state, lam, nu, cost, it, _ = carry
            state2, lam2, nu2, cost2, accept, new_cost = step(state, lam, nu, cost)
            converged = accept & (cost - new_cost < early_exit * jnp.maximum(cost, 1e-12))
            return (state2, lam2, nu2, cost2, it + 1, converged)

        state, *_ = jax.lax.while_loop(
            cond, wbody, (state0, lam0, 2.0, cost0, jnp.asarray(0, jnp.int32),
                          jnp.asarray(False)),
        )
        return with_state(state)

    def body(carry, _):
        state, lam, nu, cost = carry
        state2, lam2, nu2, cost2, _, new_cost = step(state, lam, nu, cost)
        return (state2, lam2, nu2, cost2), new_cost

    (state, _, _, _), _ = jax.lax.scan(
        body, (state0, lam0, 2.0, cost0), None, length=iterations
    )
    return with_state(state)

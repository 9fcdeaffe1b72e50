"""Whole-solver Pallas TPU kernel for F=1 pose-only tracking GN.

``windows._pose_only_fast`` already collapses the per-frame tracking
optimization (g2o_optimization.cc:700-800 FrameOptimization: 3 rounds of
10 LM iterations with chi² relabeling between rounds) to one damped 6×6
system per iteration — but as a ``lax.scan`` of ~a dozen small XLA ops per
iteration its 1.7 ms on-chip is sequential-kernel-launch latency, not
compute (<1 MFLOP total). Every operand (≤512 points, ≤128 lines, a 6×6
system) fits in a fraction of one core's VMEM.

This kernel runs the ENTIRE solve — all rounds, all LM iterations,
Huber reweighting, damping schedule, trial-cost acceptance, Cholesky
solve and the between-round inlier relabeling — in a single Pallas
program: vectors stay VMEM-resident, the pose/λ/cost state lives in
scalar registers, and HBM is touched exactly twice (operand load, result
store).

Numerics mirror ``windows._pose_only_fast`` exactly: the same residual
definitions (residuals.point_residual / line_residual with their guarded
denominators, including jacfwd's branch-selected zero derivatives at the
guards), hand-derived Jacobian columns that match ``jax.jacfwd`` of the
retraction (right-multiplied body-frame update, vertex_vi_pose.cc:69-97),
the same λ·I damping, degenerate-diagonal fix, unrolled Cholesky
(gn.solve_spd_small) and Huber weights. Equivalence is regression-tested
in tests/test_pose_gn_pallas.py (interpret mode on CPU, f32, vs the scan
solver on identical inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def available() -> bool:
    """True when the whole-solver kernel should serve F=1 vision tracking.

    Opt-out escape hatch: set ``AIRSLAM_DISABLE_POSE_GN_PALLAS=1`` to force
    the scan solver (``windows._pose_only_fast``) even on TPU — e.g. when a
    Mosaic compile regression is suspected; the two paths are numerically
    identical (tests/test_pose_gn_pallas.py)."""
    import os

    if os.environ.get("AIRSLAM_DISABLE_POSE_GN_PALLAS", "0") not in ("", "0"):
        return False
    return jax.default_backend() == "tpu"


_EPS = 1e-4  # lie._EPS (IMU_EPS, include/imu.h:20)


# ---- small algebra on tuples (components are scalars or (1,N) rows) ----

def _mmulT(A, B):
    """A @ B^T for 3×3 row-major 9-tuples."""
    return tuple(
        A[3 * i + 0] * B[3 * j + 0]
        + A[3 * i + 1] * B[3 * j + 1]
        + A[3 * i + 2] * B[3 * j + 2]
        for i in range(3) for j in range(3)
    )


def _mmul(A, B):
    return tuple(
        A[3 * i + 0] * B[0 + j] + A[3 * i + 1] * B[3 + j] + A[3 * i + 2] * B[6 + j]
        for i in range(3) for j in range(3)
    )


def _mvec(A, v):
    return (
        A[0] * v[0] + A[1] * v[1] + A[2] * v[2],
        A[3] * v[0] + A[4] * v[1] + A[5] * v[2],
        A[6] * v[0] + A[7] * v[1] + A[8] * v[2],
    )


def _mTvec(A, v):
    return (
        A[0] * v[0] + A[3] * v[1] + A[6] * v[2],
        A[1] * v[0] + A[4] * v[1] + A[7] * v[2],
        A[2] * v[0] + A[5] * v[1] + A[8] * v[2],
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _cross_e(a, k):
    """a × e_k for the canonical basis (Jacobian columns of Exp at 0)."""
    zero = a[0] * 0.0
    if k == 0:
        return (zero, a[2], -a[1])
    if k == 1:
        return (-a[2], zero, a[0])
    return (a[1], -a[0], zero)


def _so3_exp(v):
    """Rodrigues on 3 scalars -> 9-tuple; same series switch as lie.so3_exp."""
    theta2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    theta = jnp.sqrt(theta2)
    small = theta < _EPS
    one = jnp.ones_like(theta)
    st = jnp.where(small, one, theta)
    a = jnp.where(small, one, jnp.sin(st) / st)
    b = jnp.where(small, 0.5 * one, (1.0 - jnp.cos(st)) / (st * st))
    wx, wy, wz = v
    O = (0.0 * theta, -wz, wy, wz, 0.0 * theta, -wx, -wy, wx, 0.0 * theta)
    O2 = _mmul(O, O)
    I = (one, 0.0 * one, 0.0 * one, 0.0 * one, one, 0.0 * one, 0.0 * one, 0.0 * one, one)
    return tuple(I[i] + a * O[i] + b * O2[i] for i in range(9))


def _chol_solve6(H, b):
    """gn.solve_spd_small unrolled on 36 scalars (row-major 6×6)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            t = H[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _huber_w(chi2, delta2):
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, jnp.ones_like(chi2), jnp.sqrt(delta2 / safe))


def _huber_cost(chi2, delta2, active):
    lin = 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
    return jnp.sum(jnp.where(active > 0.5, jnp.where(chi2 <= delta2, chi2, lin), 0.0))


class _VisionCtx:
    """The vision (point + line) row machinery shared by the F=1 kernel and
    the VI tracking kernel (pose_gn_vi_pallas): residuals, chi², Huber cost
    and the 6 analytic pose-Jacobian columns — numerics byte-identical to
    the original inline form (pure code motion)."""

    def __init__(self, P, OB, p_st, pthr, LW, LD, LO, l_st, lthr, lsig,
                 Rcb, tcb, fx, fy, cx, cy, bf, pose_free):
        self.P, self.OB, self.p_st, self.pthr = P, OB, p_st, pthr
        self.LW, self.LD, self.LO = LW, LD, LO
        self.l_st, self.lthr, self.lsig = l_st, lthr, lsig
        self.Rcb, self.tcb = Rcb, tcb
        self.fx, self.fy, self.cx, self.cy, self.bf = fx, fy, cx, cy, bf
        self.pose_free = pose_free
        self.kv = (-fy * cx, -fx * cy, fx * fy)
        self.bb = bf / fx

    def camera_of(self, R, t):
        Rcb, tcb = self.Rcb, self.tcb
        Rcw = _mmulT(Rcb, R)          # Rcb @ R^T
        mt = _mvec(Rcw, t)
        tcw = tuple(tcb[i] - mt[i] for i in range(3))
        return Rcw, tcw

    def point_vals(self, R, t):
        P, OB = self.P, self.OB
        fx, fy, cx, cy, bf = self.fx, self.fy, self.cx, self.cy, self.bf
        Rcw, tcw = self.camera_of(R, t)
        mv = _mvec(Rcw, P)
        pc = tuple(mv[i] + tcw[i] for i in range(3))
        guard = jnp.abs(pc[2]) < 1e-9
        zs = jnp.where(guard, 1e-9, pc[2])
        zi = 1.0 / zs
        u = pc[0] * zi * fx + cx
        v = pc[1] * zi * fy + cy
        ur = u - bf * zi
        r = (OB[0] - u, OB[1] - v, OB[2] - ur)
        return r, pc, guard, zi

    def line_vals(self, R, t):
        LW, LD, LO, kv, bb = self.LW, self.LD, self.LO, self.kv, self.bb
        fx, fy = self.fx, self.fy
        Rcw, tcw = self.camera_of(R, t)
        wc = _mvec(Rcw, LW)
        dc = _mvec(Rcw, LD)
        tXd = _cross(tcw, dc)
        wc = tuple(wc[i] + tXd[i] for i in range(3))
        l0, l1 = fy * wc[0], fx * wc[1]
        l2 = kv[0] * wc[0] + kv[1] * wc[1] + kv[2] * wc[2]
        n = jnp.sqrt(l0 * l0 + l1 * l1)
        ns = jnp.where(n < 1e-12, 1e-12, n)
        e0 = (LO[0] * l0 + LO[1] * l1 + l2) / ns
        e1 = (LO[2] * l0 + LO[3] * l1 + l2) / ns
        wr = (wc[0], wc[1] + bb * dc[2], wc[2] - bb * dc[1])
        m0, m1 = fy * wr[0], fx * wr[1]
        m2 = kv[0] * wr[0] + kv[1] * wr[1] + kv[2] * wr[2]
        nr = jnp.sqrt(m0 * m0 + m1 * m1)
        nrs = jnp.where(nr < 1e-12, 1e-12, nr)
        e2 = (LO[4] * m0 + LO[5] * m1 + m2) / nrs
        e3 = (LO[6] * m0 + LO[7] * m1 + m2) / nrs
        lv = ((l0, l1, l2, n, ns), (m0, m1, m2, nr, nrs), wc, dc)
        return (e0, e1, e2, e3), lv

    def chi2_of(self, R, t, p_m, l_m):
        (r0, r1, r2), _, _, _ = self.point_vals(R, t)
        pchi2 = r0 * r0 * p_m + r1 * r1 * p_m + r2 * r2 * (p_m * self.p_st)
        (e0, e1, e2, e3), _ = self.line_vals(R, t)
        mst = l_m * self.l_st
        lchi2 = (e0 * e0 * l_m + e1 * e1 * l_m
                 + e2 * e2 * mst + e3 * e3 * mst) * self.lsig
        return pchi2, lchi2

    def cost_of(self, R, t, p_m, l_m):
        pchi2, lchi2 = self.chi2_of(R, t, p_m, l_m)
        return (_huber_cost(pchi2, self.pthr, p_m)
                + _huber_cost(lchi2, self.lthr, l_m))

    def rows_jac(self, R, t, p_m, l_m):
        """Weighted residual rows + the 6 analytic pose-Jacobian columns at
        (R, t): returns (pw, rr, pJ, lw, er, lJ)."""
        P, OB = self.P, self.OB
        p_st, pthr = self.p_st, self.pthr
        LW, LD, LO = self.LW, self.LD, self.LO
        l_st, lthr, lsig = self.l_st, self.lthr, self.lsig
        Rcb, kv, bb = self.Rcb, self.kv, self.bb
        fx, fy, bf = self.fx, self.fy, self.bf
        pose_free = self.pose_free
        _, tcw = self.camera_of(R, t)

        # ---- residuals + analytic Jacobian columns at (R, t) ----
        (r0, r1, r2), pc, guard, zi = self.point_vals(R, t)
        mst = p_m * p_st
        pchi2 = r0 * r0 * p_m + r1 * r1 * p_m + r2 * r2 * mst
        pw = _huber_w(pchi2, pthr) * p_m
        dzi_dz = jnp.where(guard, 0.0, -zi * zi)
        pb = _mTvec(R, tuple(P[i] - t[i] for i in range(3)))  # body-frame point
        rr = (r0 * p_m, r1 * p_m, r2 * mst)

        (e0, e1, e2, e3), lv = self.line_vals(R, t)
        (l0, l1, l2, n, ns), (m0, m1, m2, nr, nrs), wc, dc = lv
        lmst = l_m * l_st
        lchi2 = (e0 * e0 * l_m + e1 * e1 * l_m + e2 * e2 * lmst + e3 * e3 * lmst) * lsig
        lw = _huber_w(lchi2, lthr) * l_m * lsig
        db = _mTvec(R, LD)
        wb = _mTvec(R, LW)
        tb = _mTvec(R, t)
        er = (e0 * l_m, e1 * l_m, e2 * lmst, e3 * lmst)

        pJ, lJ = [], []
        for k in range(6):
            if k < 3:
                dpc = _mvec(Rcb, _cross_e(pb, k))
                dd = _mvec(Rcb, _cross_e(db, k))
                dtcw = tuple(-x for x in _mvec(Rcb, _cross_e(tb, k)))
                dwc = _mvec(Rcb, _cross_e(wb, k))
                c1, c2 = _cross(dtcw, dc), _cross(tcw, dd)
                dwc = tuple(dwc[i] + c1[i] + c2[i] for i in range(3))
            else:
                c = k - 3
                col = (-Rcb[c], -Rcb[3 + c], -Rcb[6 + c])
                dpc = col
                dd = (jnp.zeros_like(dc[0]),) * 3
                dwc = _cross(col, dc)
            # point rows: residual = obs - proj  =>  J = -dproj
            dzi = dzi_dz * dpc[2]
            du = fx * (dpc[0] * zi + pc[0] * dzi)
            dv = fy * (dpc[1] * zi + pc[1] * dzi)
            dur = du - bf * dzi
            pJ.append(((-du) * p_m * pose_free,
                       (-dv) * p_m * pose_free,
                       (-dur) * mst * pose_free))
            # line rows
            dl0, dl1 = fy * dwc[0], fx * dwc[1]
            dl2 = kv[0] * dwc[0] + kv[1] * dwc[1] + kv[2] * dwc[2]
            dns = jnp.where(n < 1e-12, 0.0,
                            (l0 * dl0 + l1 * dl1) / jnp.maximum(n, 1e-30))
            de0 = (LO[0] * dl0 + LO[1] * dl1 + dl2) / ns - e0 * dns / ns
            de1 = (LO[2] * dl0 + LO[3] * dl1 + dl2) / ns - e1 * dns / ns
            dwr = (dwc[0], dwc[1] + bb * dd[2], dwc[2] - bb * dd[1])
            dm0, dm1 = fy * dwr[0], fx * dwr[1]
            dm2 = kv[0] * dwr[0] + kv[1] * dwr[1] + kv[2] * dwr[2]
            dnr = jnp.where(nr < 1e-12, 0.0,
                            (m0 * dm0 + m1 * dm1) / jnp.maximum(nr, 1e-30))
            de2 = (LO[4] * dm0 + LO[5] * dm1 + dm2) / nrs - e2 * dnr / nrs
            de3 = (LO[6] * dm0 + LO[7] * dm1 + dm2) / nrs - e3 * dnr / nrs
            lJ.append((de0 * l_m * pose_free, de1 * l_m * pose_free,
                       de2 * lmst * pose_free, de3 * lmst * pose_free))
        return pw, rr, pJ, lw, er, lJ


def _vis_h6_b6(ctx, pw, rr, pJ, lw, er, lJ):
    """Undamped vision-only 6×6 normal equations from rows_jac output."""
    H = [[None] * 6 for _ in range(6)]
    b = [None] * 6
    for a in range(6):
        for c in range(a, 6):
            acc = sum(jnp.sum(pw * pJ[a][r] * pJ[c][r]) for r in range(3))
            acc = acc + sum(jnp.sum(lw * lJ[a][r] * lJ[c][r]) for r in range(4))
            H[a][c] = acc
            H[c][a] = acc
        bb_acc = sum(jnp.sum(pw * pJ[a][r] * rr[r]) for r in range(3))
        bb_acc = bb_acc + sum(jnp.sum(lw * lJ[a][r] * er[r]) for r in range(4))
        b[a] = -bb_acc
    return H, b


def _kernel(pts_ref, pobs_ref, pvec_ref, lns_ref, lobs_ref, lvec_ref,
            scal_ref, pose_ref, pin_ref, lin_ref, *, rounds, iters):
    f32 = jnp.float32
    s = lambda k: scal_ref[0, k]
    R0 = tuple(s(i) for i in range(9))
    t0 = (s(9), s(10), s(11))
    Rcb = tuple(s(12 + i) for i in range(9))
    tcb = (s(21), s(22), s(23))
    fx, fy, cx, cy, bf = s(24), s(25), s(26), s(27), s(28)
    pose_free = s(29)
    lam0, nu0 = s(30), s(31)

    # point rows (1, Np)
    P = (pts_ref[0:1, :], pts_ref[1:2, :], pts_ref[2:3, :])
    OB = (pobs_ref[0:1, :], pobs_ref[1:2, :], pobs_ref[2:3, :])
    p_base = pvec_ref[0:1, :]
    p_st = pvec_ref[1:2, :]
    pthr = pvec_ref[2:3, :]
    # line rows (1, Nl)
    LW = (lns_ref[0:1, :], lns_ref[1:2, :], lns_ref[2:3, :])
    LD = (lns_ref[3:4, :], lns_ref[4:5, :], lns_ref[5:6, :])
    LO = tuple(lobs_ref[i:i + 1, :] for i in range(8))
    l_base = lvec_ref[0:1, :]
    l_st = lvec_ref[1:2, :]
    lthr = lvec_ref[2:3, :]
    lsig = lvec_ref[3:4, :]

    ctx = _VisionCtx(P, OB, p_st, pthr, LW, LD, LO, l_st, lthr, lsig,
                     Rcb, tcb, fx, fy, cx, cy, bf, pose_free)

    def lm_iter(carry, p_m, l_m):
        R = carry[0:9]
        t = carry[9:12]
        lam, nu, cost = carry[12], carry[13], carry[14]

        pw, rr, pJ, lw, er, lJ = ctx.rows_jac(R, t, p_m, l_m)

        # ---- assemble the damped 6×6 ----
        H, b = _vis_h6_b6(ctx, pw, rr, pJ, lw, er, lJ)
        for a in range(6):
            H[a][a] = H[a][a] + lam
        for a in range(6):
            H[a][a] = H[a][a] + jnp.where(H[a][a] < 1e-10, 1.0, 0.0)
        dx = _chol_solve6(H, b)

        # ---- retract + accept ----
        Rexp = _so3_exp((dx[0], dx[1], dx[2]))
        R2 = _mmul(R, Rexp)
        Rdt = _mvec(R, (dx[3], dx[4], dx[5]))
        t2 = tuple(t[i] + Rdt[i] for i in range(3))
        new_cost = ctx.cost_of(R2, t2, p_m, l_m)
        acc = new_cost < cost
        R3 = tuple(jnp.where(acc, R2[i], R[i]) for i in range(9))
        t3 = tuple(jnp.where(acc, t2[i], t[i]) for i in range(3))
        lam2 = jnp.where(acc, lam / 3.0, lam * nu)
        nu2 = jnp.where(acc, 2.0, nu * 2.0)
        cost2 = jnp.where(acc, new_cost, cost)
        return R3 + t3 + (lam2, nu2, cost2)

    p_m, l_m = p_base, l_base
    p_in, l_in = p_base, l_base
    R, t = R0, t0
    for _ in range(rounds):
        cost0 = ctx.cost_of(R0, t0, p_m, l_m)
        carry0 = R0 + t0 + (lam0, nu0, cost0)
        carry = jax.lax.fori_loop(
            0, iters, lambda _, c: lm_iter(c, p_m, l_m), carry0)
        R, t = carry[0:9], carry[9:12]
        # relabel over the FULL base observation set
        pchi2, lchi2 = ctx.chi2_of(R, t, p_base, l_base)
        (_, _, _), pc, _, _ = ctx.point_vals(R, t)
        p_in = ((pchi2 <= pthr) & (pc[2] > 0) & (p_base > 0.5)).astype(f32)
        l_in = ((lchi2 <= lthr) & (l_base > 0.5)).astype(f32)
        p_m, l_m = p_in, l_in

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    pose = jnp.zeros((1, 128), f32)
    for i in range(9):
        pose = pose + jnp.where(lane == i, R[i], 0.0)
    for i in range(3):
        pose = pose + jnp.where(lane == 9 + i, t[i], 0.0)
    pose_ref[:, :] = pose
    pin_ref[:, :] = p_in
    lin_ref[:, :] = l_in


@functools.partial(jax.jit, static_argnames=("rounds", "iters", "interpret"))
def _call(pts, pobs, pvec, lns, lobs, lvec, scal, rounds, iters, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np_, nl_ = pts.shape[1], lns.shape[1]
    vspec = lambda r, c: pl.BlockSpec((r, c), lambda: (0, 0),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, rounds=rounds, iters=iters),
        out_shape=(
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, nl_), jnp.float32),
        ),
        in_specs=[vspec(3, np_), vspec(3, np_), vspec(3, np_),
                  vspec(6, nl_), vspec(8, nl_), vspec(4, nl_),
                  vspec(1, 128)],
        out_specs=(vspec(1, 128), vspec(1, np_), vspec(1, nl_)),
        interpret=interpret,
    )(pts, pobs, pvec, lns, lobs, lvec, scal)


@functools.partial(jax.jit, static_argnames=("rounds", "iters", "interpret"))
def pose_only_fast_pallas(problem, intr, cfg, rounds: int = 3, iters: int = 10,
                          interpret: bool = False):
    """Drop-in for ``windows._pose_only_fast`` (F=1, vision-only, landmarks
    fixed): same return contract (problem', point_inlier (P,1), line_inlier
    (L,1), num_inliers)."""
    f32 = jnp.float32
    npts = problem.points.shape[0]
    nlns = problem.lines.shape[0]
    # pad both edge families to at least one full 128-lane block: a
    # zero-width VMEM BlockSpec (npts == 0 or nlns == 0) fails pallas_call
    np_pad = max(0, 128 - npts) if npts < 128 else (-npts % 128)
    nl_pad = max(0, 128 - nlns) if nlns < 128 else (-nlns % 128)

    pts = jnp.pad(problem.points.astype(f32).T, ((0, 0), (0, np_pad)))
    pobs = jnp.pad(problem.point_obs[:, 0, :].astype(f32).T, ((0, 0), (0, np_pad)))
    is_stereo = problem.point_obs[:, 0, 2] >= 0
    pthr = jnp.where(is_stereo, cfg.stereo_point, cfg.mono_point)
    pvec = jnp.pad(jnp.stack([
        problem.point_obs_mask[:, 0].astype(f32),
        is_stereo.astype(f32),
        pthr.astype(f32),
    ]), ((0, 0), (0, np_pad)))

    lns = jnp.pad(problem.lines.astype(f32).T, ((0, 0), (0, nl_pad)))
    lobs = jnp.pad(problem.line_obs[:, 0, :].astype(f32).T, ((0, 0), (0, nl_pad)))
    lthr = jnp.where(problem.line_obs_stereo[:, 0], cfg.stereo_line, cfg.mono_line)
    lvec = jnp.pad(jnp.stack([
        problem.line_obs_mask[:, 0].astype(f32),
        problem.line_obs_stereo[:, 0].astype(f32),
        lthr.astype(f32),
        problem.line_obs_sigma[:, 0].astype(f32),
    ]), ((0, 0), (0, nl_pad)))

    scal = jnp.zeros((1, 128), f32)
    scal = scal.at[0, 0:9].set(problem.frames.Rwb[0].astype(f32).reshape(9))
    scal = scal.at[0, 9:12].set(problem.frames.twb[0].astype(f32))
    scal = scal.at[0, 12:21].set(problem.Rcb.astype(f32).reshape(9))
    scal = scal.at[0, 21:24].set(problem.tcb.astype(f32))
    scal = scal.at[0, 24:29].set(jnp.stack([
        intr.fx, intr.fy, intr.cx, intr.cy, intr.bf]).astype(f32))
    pose_free = (~problem.pose_fixed[0]).astype(f32)
    scal = scal.at[0, 29].set(pose_free)
    from airslam_tpu.backend.windows import POSE_LM_LAM0, POSE_LM_NU0

    scal = scal.at[0, 30].set(POSE_LM_LAM0)  # shared LM damping schedule
    scal = scal.at[0, 31].set(POSE_LM_NU0)

    pose, p_in, l_in = _call(pts, pobs, pvec, lns, lobs, lvec, scal,
                             rounds, iters, interpret)
    dtype = problem.points.dtype
    R = pose[0, 0:9].reshape(3, 3).astype(dtype)
    t = pose[0, 9:12].astype(dtype)
    p_mask = (p_in[0, :npts] > 0.5)
    l_mask = (l_in[0, :nlns] > 0.5)
    out = problem._replace(
        frames=problem.frames._replace(Rwb=R[None], twb=t[None]))
    num_inliers = jnp.sum(p_mask) + jnp.sum(l_mask)
    return out, p_mask[:, None], l_mask[:, None], num_inliers

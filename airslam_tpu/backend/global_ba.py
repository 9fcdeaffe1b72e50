"""Map-scale bundle adjustment — sparse observation-list formulation.

``backend.gn`` models the sliding window as dense (landmark × frame) grids:
ideal for ≤64-frame windows (one compiled program, no gathers), hopeless at
map scale (a 1,000-keyframe / 100k-point map would need terabyte-sized
(P, F, 3, 9) Jacobian grids). This module is the ``GlobalBA`` equivalent
(g2o_optimization.cc:1488-1959) with the sparsity made explicit, TPU-style:

- observations are a flat padded list (N,) of (point_idx, frame_idx, uv);
  residuals/Jacobians are one vmap over N — no (P, F) blowup;
- per-point 3×3 Hessian blocks and per-frame 6×6 blocks accumulate with
  scatter-adds (segment sums);
- the Schur complement pairs observations of the same point through a
  per-point observation index table (P, K≤MAX_OBS) and accumulates into the
  (F, F, 6, 6) reduced camera matrix in point CHUNKS (bounded memory:
  chunk·K²·36 floats at a time, via lax.map);
- the reduced 6F system is solved dense — Cholesky on the MXU; at F = 1,000
  that is a 6,000² matrix (~144 MB f32), well within HBM, and far faster
  than sparse pointer-chasing at this density;
- landmark updates back-substitute in one batched op.

Lines use the same machinery with 4-dof orthonormal tangents. The robust
two-pass schedule (optimize → chi² gate → optimize) mirrors local_ba.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airslam_tpu.backend import gn
from airslam_tpu.backend import residuals as res
from airslam_tpu.backend.gn import BAConfig, IMUFactors
from airslam_tpu.core import lie

POSE_DIM = 6
FRAME_DIM = 15  # pose 6 + vel 3 + bias 6 (VI maps)


class SparseBAProblem(NamedTuple):
    # frames
    Rwb: jax.Array  # (F, 3, 3)
    twb: jax.Array  # (F, 3)
    pose_fixed: jax.Array  # (F,) bool
    # points + their observations
    points: jax.Array  # (P, 3)
    pobs_pidx: jax.Array  # (N,) int32 — point index per observation
    pobs_fidx: jax.Array  # (N,) int32
    pobs: jax.Array  # (N, 3) (u, v, u_r); u_r < 0 ⇒ mono
    pobs_mask: jax.Array  # (N,) bool
    point_obs_table: jax.Array  # (P, K) int32 indices into pobs_*; == N ⇒ pad
    # lines + their observations
    lines: jax.Array  # (L, 6) Plücker
    lobs_lidx: jax.Array  # (M,)
    lobs_fidx: jax.Array  # (M,)
    lobs: jax.Array  # (M, 8)
    lobs_stereo: jax.Array  # (M,) bool
    lobs_mask: jax.Array  # (M,)
    lobs_sigma: jax.Array  # (M,)
    line_obs_table: jax.Array  # (L, K2)
    # camera
    Rcb: jax.Array
    tcb: jax.Array
    # visual-inertial map state (None ⇒ vision-only). When ``imu`` is set the
    # reduced system grows to 15 dof/frame (pose | velocity | gyr+acc bias)
    # and the preintegration chain couples consecutive keyframes directly in
    # the reduced camera matrix (IMU edges touch no landmarks, so the Schur
    # trick is unchanged). Gravity is pinned — GlobalBA runs after VI
    # initialization has aligned the world frame (g2o_optimization.cc:1488).
    vel: Optional[jax.Array] = None  # (F, 3)
    bg: Optional[jax.Array] = None  # (F, 3)
    ba: Optional[jax.Array] = None  # (F, 3)
    vel_fixed: Optional[jax.Array] = None  # (F,) bool
    Rwg: Optional[jax.Array] = None  # (3, 3)
    imu: Optional[IMUFactors] = None
    g_value: jax.Array = 9.81  # gravity magnitude (per-problem, no globals)


def _point_rj(prob: SparseBAProblem, intr, with_jac: bool):
    """Per-observation residual (N, 3), row mask, and J wrt (pose 6 | point 3)."""

    def one(oi):
        Rwb = prob.Rwb[prob.pobs_fidx[oi]]
        twb = prob.twb[prob.pobs_fidx[oi]]
        point = prob.points[prob.pobs_pidx[oi]]
        obs = prob.pobs[oi]

        def f(delta):
            R2, t2 = res.retract_pose(Rwb, twb, delta[0:6])
            Rcw, tcw = res.pose_to_camera(R2, t2, prob.Rcb, prob.tcb)
            r, z = res.point_residual(Rcw, tcw, point + delta[6:9], obs, intr)
            return r, z

        if with_jac:
            J, (r, z) = _jac(f, 9, prob.points.dtype)
            return r, z, J
        r, z = f(jnp.zeros((9,), prob.points.dtype))
        return r, z, jnp.zeros((3, 9), prob.points.dtype)

    r, z, J = jax.vmap(one)(jnp.arange(prob.pobs.shape[0]))
    is_stereo = prob.pobs[:, 2] >= 0
    row_mask = jnp.stack(
        [prob.pobs_mask, prob.pobs_mask, prob.pobs_mask & is_stereo], axis=-1
    ).astype(r.dtype)
    return r, row_mask, z > 0, J[:, :, 0:6], J[:, :, 6:9]


def _line_rj(prob: SparseBAProblem, intr, with_jac: bool):
    def one(oi):
        Rwb = prob.Rwb[prob.lobs_fidx[oi]]
        twb = prob.twb[prob.lobs_fidx[oi]]
        line = prob.lines[prob.lobs_lidx[oi]]
        obs = prob.lobs[oi]

        def f(delta):
            R2, t2 = res.retract_pose(Rwb, twb, delta[0:6])
            Rcw, tcw = res.pose_to_camera(R2, t2, prob.Rcb, prob.tcb)
            line2 = lie.line_orthonormal_oplus(line, delta[6:10])
            r = res.line_residual(Rcw, tcw, line2, obs, intr)
            return r, r

        if with_jac:
            J, (r, _) = _jac(f, 10, prob.lines.dtype)
            return r, J
        r, _ = f(jnp.zeros((10,), prob.lines.dtype))
        return r, jnp.zeros((4, 10), prob.lines.dtype)

    r, J = jax.vmap(one)(jnp.arange(prob.lobs.shape[0]))
    row_mask = jnp.stack(
        [prob.lobs_mask, prob.lobs_mask,
         prob.lobs_mask & prob.lobs_stereo, prob.lobs_mask & prob.lobs_stereo],
        axis=-1,
    ).astype(r.dtype)
    return r, row_mask, J[:, :, 0:6], J[:, :, 6:10]


def _jac(f, n, dtype=None):
    zero = jnp.zeros((n,), dtype)

    def split(delta):
        out = f(delta)
        return out[0], out

    J, out = jax.jacfwd(split, has_aux=True)(zero)
    return J, out


def point_chi2(prob: SparseBAProblem, intr):
    r, row_mask, depth_ok, _, _ = _point_rj(prob, intr, with_jac=False)
    return jnp.sum(r * r * row_mask, axis=-1), depth_ok


def line_chi2(prob: SparseBAProblem, intr):
    r, row_mask, _, _ = _line_rj(prob, intr, with_jac=False)
    return jnp.sum(r * r * row_mask, axis=-1) * prob.lobs_sigma


def _frame_states(prob: SparseBAProblem) -> gn.FrameStates:
    return gn.FrameStates(Rwb=prob.Rwb, twb=prob.twb, vel=prob.vel,
                          bg=prob.bg, ba=prob.ba)


def _total_cost(prob, intr, cfg: BAConfig, robust: bool):
    pchi2, _ = point_chi2(prob, intr)
    pthr = jnp.where(prob.pobs[:, 2] >= 0, cfg.stereo_point, cfg.mono_point)
    lchi2 = line_chi2(prob, intr)
    lthr = jnp.where(prob.lobs_stereo, cfg.stereo_line, cfg.mono_line)
    if robust:
        from airslam_tpu.backend.gn import _huber_cost

        cost = _huber_cost(pchi2, pthr, prob.pobs_mask) + _huber_cost(
            lchi2, lthr, prob.lobs_mask
        )
    else:
        cost = jnp.sum(jnp.where(prob.pobs_mask, pchi2, 0.0)) + jnp.sum(
            jnp.where(prob.lobs_mask, lchi2, 0.0)
        )
    if prob.imu is not None:
        r, _ = gn.imu_residuals(_frame_states(prob), prob.imu, prob.Rwg, False,
                                prob.g_value)
        r9, rw = r[:, :9], r[:, 9:15]
        info9 = prob.imu.info * cfg.imu_info_scale
        c_imu = jnp.einsum("ki,kij,kj->k", r9, info9, r9)
        c_walk = jnp.einsum("ki,kij,kj->k", rw, prob.imu.info_walk, rw)
        if robust:
            from airslam_tpu.backend.gn import _huber_cost

            cost = cost + _huber_cost(c_imu, jnp.full_like(c_imu, 16.92),
                                      prob.imu.mask)
        else:
            cost = cost + jnp.sum(jnp.where(prob.imu.mask, c_imu, 0.0))
        cost = cost + jnp.sum(jnp.where(prob.imu.mask, c_walk, 0.0))
    return cost


def _schur_accumulate(W, Hinv, bland, table, fidx, f, chunk: int, tan: int):
    """Accumulate S (F, F, 6, 6) and bs (F, 6) over landmark chunks.

    W: (N+1, 6, tan) per-observation cross blocks (row N = zero pad);
    Hinv: (P, tan, tan); bland: (P, tan); table: (P, K) obs indices (N ⇒ pad);
    fidx: (N+1,) frame index per obs (pad row points at frame 0 with zero W).
    """
    p, k = table.shape
    pad_to = ((p + chunk - 1) // chunk) * chunk
    table_p = jnp.concatenate(
        [table, jnp.full((pad_to - p, k), W.shape[0] - 1, table.dtype)], axis=0
    ).reshape(-1, chunk, k)
    Hinv_p = jnp.concatenate(
        [Hinv, jnp.zeros((pad_to - p,) + Hinv.shape[1:], Hinv.dtype)], axis=0
    ).reshape(-1, chunk, tan, tan)
    b_p = jnp.concatenate(
        [bland, jnp.zeros((pad_to - p, tan), bland.dtype)], axis=0
    ).reshape(-1, chunk, tan)

    def chunk_body(carry, args):
        S, bs = carry
        tbl, Hi, bl = args  # (chunk, K), (chunk, tan, tan), (chunk, tan)
        Wk = W[tbl]  # (chunk, K, 6, tan)
        fk = fidx[tbl]  # (chunk, K)
        WH = jnp.einsum("ckat,cts->ckas", Wk, Hi)  # (chunk, K, 6, tan)
        Spair = jnp.einsum("ckas,clbs->cklab", WH, Wk)  # (chunk, K, K, 6, 6)
        bpair = jnp.einsum("ckas,cs->cka", WH, bl)  # (chunk, K, 6)
        S = S.at[fk[:, :, None], fk[:, None, :]].add(Spair)
        bs = bs.at[fk].add(bpair)
        return (S, bs), None

    S0 = jnp.zeros((f, f, POSE_DIM, POSE_DIM), W.dtype)
    bs0 = jnp.zeros((f, POSE_DIM), W.dtype)
    (S, bs), _ = jax.lax.scan(chunk_body, (S0, bs0), (table_p, Hinv_p, b_p))
    return S, bs


def _assemble_and_solve(prob: SparseBAProblem, intr, cfg, lam, robust,
                        chunk: int):
    f = prob.Rwb.shape[0]
    p = prob.points.shape[0]
    l = prob.lines.shape[0]
    n = prob.pobs.shape[0]
    m = prob.lobs.shape[0]
    dtype = prob.points.dtype
    pose_free = (~prob.pose_fixed).astype(dtype)

    # -- points --------------------------------------------------------------
    r, row_mask, depth_ok, Jc, Jp = _point_rj(prob, intr, True)
    chi2 = jnp.sum(r * r * row_mask, axis=-1)
    thr = jnp.where(prob.pobs[:, 2] >= 0, cfg.stereo_point, cfg.mono_point)
    w = res.huber_weight(chi2, thr) if robust else jnp.ones_like(chi2)
    w = w * prob.pobs_mask
    Jc = Jc * row_mask[..., None] * pose_free[prob.pobs_fidx][:, None, None]
    Jp = Jp * row_mask[..., None]
    rw = r * row_mask

    Hcc = jnp.zeros((f, POSE_DIM, POSE_DIM), dtype).at[prob.pobs_fidx].add(
        jnp.einsum("n,nri,nrj->nij", w, Jc, Jc)
    )
    bc = jnp.zeros((f, POSE_DIM), dtype).at[prob.pobs_fidx].add(
        -jnp.einsum("n,nri,nr->ni", w, Jc, rw)
    )
    Hpp = jnp.zeros((p, 3, 3), dtype).at[prob.pobs_pidx].add(
        jnp.einsum("n,nri,nrj->nij", w, Jp, Jp)
    )
    bp = jnp.zeros((p, 3), dtype).at[prob.pobs_pidx].add(
        -jnp.einsum("n,nri,nr->ni", w, Jp, rw)
    )
    Wcp = jnp.einsum("n,nri,nrj->nij", w, Jc, Jp)  # (N, 6, 3)

    # -- lines ---------------------------------------------------------------
    lr, lrow, LJc, LJl = _line_rj(prob, intr, True)
    lchi2 = jnp.sum(lr * lr * lrow, axis=-1) * prob.lobs_sigma
    lthr = jnp.where(prob.lobs_stereo, cfg.stereo_line, cfg.mono_line)
    lw = res.huber_weight(lchi2, lthr) if robust else jnp.ones_like(lchi2)
    lw = lw * prob.lobs_mask * prob.lobs_sigma
    LJc = LJc * lrow[..., None] * pose_free[prob.lobs_fidx][:, None, None]
    LJl = LJl * lrow[..., None]
    lrw = lr * lrow

    Hcc = Hcc.at[prob.lobs_fidx].add(jnp.einsum("n,nri,nrj->nij", lw, LJc, LJc))
    bc = bc.at[prob.lobs_fidx].add(-jnp.einsum("n,nri,nr->ni", lw, LJc, lrw))
    Hll = jnp.zeros((l, 4, 4), dtype).at[prob.lobs_lidx].add(
        jnp.einsum("n,nri,nrj->nij", lw, LJl, LJl)
    )
    bl = jnp.zeros((l, 4), dtype).at[prob.lobs_lidx].add(
        -jnp.einsum("n,nri,nr->ni", lw, LJl, lrw)
    )
    Wcl = jnp.einsum("n,nri,nrj->nij", lw, LJc, LJl)  # (M, 6, 4)

    # -- landmark block inverses (damped, pinned when untouched) -------------
    Hpp_d = Hpp + lam * jnp.eye(3, dtype=dtype)[None]
    Hpp_d = Hpp_d + jnp.eye(3, dtype=dtype)[None] * (
        (jnp.einsum("pii->p", Hpp) < 1e-10).astype(dtype)[:, None, None]
    )
    Hll_d = Hll + lam * jnp.eye(4, dtype=dtype)[None]
    Hll_d = Hll_d + jnp.eye(4, dtype=dtype)[None] * (
        (jnp.einsum("lii->l", Hll) < 1e-10).astype(dtype)[:, None, None]
    )
    Hpp_inv = gn.inv3_spd(Hpp_d)
    Hll_inv = gn.inv4_spd(Hll_d)

    # -- Schur over landmark chunks ------------------------------------------
    Wp_pad = jnp.concatenate([Wcp, jnp.zeros((1, POSE_DIM, 3), dtype)], axis=0)
    fidx_pad = jnp.concatenate(
        [prob.pobs_fidx, jnp.zeros((1,), prob.pobs_fidx.dtype)]
    )
    S, bs = _schur_accumulate(
        Wp_pad, Hpp_inv, bp, prob.point_obs_table, fidx_pad, f, chunk, 3
    )
    Wl_pad = jnp.concatenate([Wcl, jnp.zeros((1, POSE_DIM, 4), dtype)], axis=0)
    lfidx_pad = jnp.concatenate(
        [prob.lobs_fidx, jnp.zeros((1,), prob.lobs_fidx.dtype)]
    )
    S2, bs2 = _schur_accumulate(
        Wl_pad, Hll_inv, bl, prob.line_obs_table, lfidx_pad, f, chunk, 4
    )
    S = S + S2
    bs = bs + bs2

    # -- reduced camera system ------------------------------------------------
    if prob.imu is None:
        D = f * POSE_DIM
        Hred = (
            _blockdiag(Hcc) - S.transpose(0, 2, 1, 3).reshape(D, D)
        )
        bred = (bc - bs).reshape(D)
        dvi = None
    else:
        # VI maps: 15 dof/frame. The visual (pose-only) reduced system embeds
        # in the pose sub-blocks; preintegration + bias-walk factor blocks
        # scatter across the (frame_i, frame_j) pairs (gravity pinned).
        D = f * FRAME_DIM
        Hred = jnp.zeros((D, D), dtype)
        bred = jnp.zeros((D,), dtype)
        pose_cols = (
            jnp.arange(f)[:, None] * FRAME_DIM + jnp.arange(POSE_DIM)[None, :]
        ).reshape(-1)
        Hvis = _blockdiag(Hcc) - S.transpose(0, 2, 1, 3).reshape(
            f * POSE_DIM, f * POSE_DIM)
        Hred = Hred.at[jnp.ix_(pose_cols, pose_cols)].add(Hvis)
        bred = bred.at[pose_cols].add((bc - bs).reshape(-1))

        imu = prob.imu
        ir, iJ = gn.imu_residuals(_frame_states(prob), imu, prob.Rwg, True,
                                  prob.g_value)
        info9 = imu.info * cfg.imu_info_scale
        if robust:
            c_imu = jnp.einsum("ki,kij,kj->k", ir[:, :9], info9, ir[:, :9])
            wi = res.huber_weight(c_imu, jnp.full_like(c_imu, 16.92))
        else:
            wi = jnp.ones((ir.shape[0],), dtype)
        wi = wi * imu.mask
        big_info = jnp.zeros((ir.shape[0], 15, 15), dtype)
        big_info = big_info.at[:, :9, :9].set(info9 * wi[:, None, None])
        big_info = big_info.at[:, 9:15, 9:15].set(
            imu.info_walk * imu.mask[:, None, None].astype(dtype)
        )

        vel_free = (~prob.vel_fixed).astype(dtype)

        def col_mask_for(idx):
            return jnp.concatenate([
                jnp.full((6,), 1.0, dtype) * pose_free[idx],
                jnp.full((9,), 1.0, dtype) * vel_free[idx],
            ])

        cm_i = jax.vmap(col_mask_for)(imu.idx_i)  # (K, 15)
        cm_j = jax.vmap(col_mask_for)(imu.idx_j)
        cm = jnp.concatenate(
            [cm_i, cm_j, jnp.zeros((ir.shape[0], 2), dtype)], axis=1
        )
        iJ = iJ * cm[:, None, :]
        JtW = jnp.einsum("krc,krs->ksc", iJ, big_info)  # (K, 15, 32)
        Hk = jnp.einsum("ksc,ksd->kcd", JtW, iJ)[:, :30, :30]  # (K, 30, 30)
        bk = -jnp.einsum("ksc,ks->kc", JtW, ir)[:, :30]

        def factor_cols(k):
            ci = imu.idx_i[k] * FRAME_DIM + jnp.arange(FRAME_DIM)
            cj = imu.idx_j[k] * FRAME_DIM + jnp.arange(FRAME_DIM)
            return jnp.concatenate([ci, cj])

        cols = jax.vmap(factor_cols)(jnp.arange(ir.shape[0]))  # (K, 30)

        def scatter_one(carry, kc):
            Hc, bc2 = carry
            Hk_k, bk_k, col = kc
            Hc = Hc.at[col[:, None], col[None, :]].add(Hk_k)
            bc2 = bc2.at[col].add(bk_k)
            return (Hc, bc2), None

        (Hred, bred), _ = jax.lax.scan(scatter_one, (Hred, bred), (Hk, bk, cols))

    diag = jnp.diagonal(Hred)
    Hred = Hred + jnp.diag(jnp.where(diag < 1e-10, 1.0, 0.0) + lam * jnp.maximum(diag, 1.0))
    # Jacobi (symmetric diagonal) preconditioning: BA Hessians mix pixel²
    # and unitless scales across columns, which wrecks an f32 factorization;
    # scaling to a unit diagonal keeps the solve accurate in f32 on the MXU.
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(Hred), 1e-12))
    Hs = Hred / (d[:, None] * d[None, :])
    dx = gn.solve_spd(Hs, bred / d) / d
    if prob.imu is None:
        dxc = dx.reshape(f, POSE_DIM)
    else:
        dx = dx.reshape(f, FRAME_DIM)
        dxc = dx[:, 0:6]
        dvi = (dx[:, 6:9], dx[:, 9:12], dx[:, 12:15])

    # -- back-substitute landmarks --------------------------------------------
    # rhs_p = bp - Σ_obs W^T dxc[f(obs)]
    contrib_p = jnp.einsum("nij,ni->nj", Wcp, dxc[prob.pobs_fidx])
    rhs_p = bp - jnp.zeros_like(bp).at[prob.pobs_pidx].add(contrib_p)
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, rhs_p)
    contrib_l = jnp.einsum("nij,ni->nj", Wcl, dxc[prob.lobs_fidx])
    rhs_l = bl - jnp.zeros_like(bl).at[prob.lobs_lidx].add(contrib_l)
    dl = jnp.einsum("lij,lj->li", Hll_inv, rhs_l)
    return dxc, dp, dl, dvi


def _blockdiag(blocks):
    f, k, _ = blocks.shape
    eye = jnp.eye(f, dtype=blocks.dtype)
    return jnp.einsum("fg,fij->figj", eye, blocks).reshape(f * k, f * k)


def _apply(prob: SparseBAProblem, dxc, dp, dl, dvi) -> SparseBAProblem:
    dt = prob.twb.dtype
    Rwb, twb = jax.vmap(res.retract_pose)(prob.Rwb, prob.twb, dxc.astype(dt))
    lines = jax.vmap(lie.line_orthonormal_oplus)(prob.lines, dl.astype(prob.lines.dtype))
    out = prob._replace(Rwb=Rwb.astype(dt), twb=twb.astype(dt),
                        points=prob.points + dp.astype(prob.points.dtype),
                        lines=lines.astype(prob.lines.dtype))
    if dvi is not None:
        dvel, dbg, dba = dvi
        out = out._replace(vel=prob.vel + dvel.astype(dt),
                           bg=prob.bg + dbg.astype(dt),
                           ba=prob.ba + dba.astype(dt))
    return out


@functools.partial(jax.jit, static_argnames=("iterations", "robust", "chunk"))
def optimize(prob: SparseBAProblem, intr, cfg: BAConfig, iterations: int,
             robust: bool = True, chunk: int = 2048, tau: float = 1e-5):
    dt = prob.twb.dtype
    cost0 = _total_cost(prob, intr, cfg, robust).astype(dt)
    lam0 = jnp.asarray(tau * 100.0, dt)

    def body(carry, _):
        state, lam, nu, cost = carry
        dxc, dp, dl, dvi = _assemble_and_solve(state, intr, cfg, lam, robust, chunk)
        cand = _apply(state, dxc, dp, dl, dvi)
        new_cost = _total_cost(cand, intr, cfg, robust).astype(dt)
        accept = new_cost < cost
        state2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, state
        )
        return (
            state2,
            jnp.where(accept, lam / 3.0, lam * nu),
            jnp.where(accept, jnp.asarray(2.0, dt), nu * 2.0),
            jnp.where(accept, new_cost, cost),
        ), None

    (state, _, _, _), _ = jax.lax.scan(
        body, (prob, lam0, jnp.asarray(2.0, dt), cost0), None, length=iterations
    )
    return state


@functools.partial(jax.jit, static_argnames=("iters1", "iters2", "chunk"))
def global_ba(prob: SparseBAProblem, intr, cfg: BAConfig = BAConfig(),
              iters1: int = 50, iters2: int = 40, chunk: int = 2048):
    """Two-pass robust schedule like GlobalBA: optimize → chi² gate →
    optimize on inliers → final inlier flags on the original set."""
    prob1 = optimize(prob, intr, cfg, iters1, robust=True, chunk=chunk)

    pchi2, depth_ok = point_chi2(prob1, intr)
    pthr = jnp.where(prob1.pobs[:, 2] >= 0, cfg.stereo_point, cfg.mono_point)
    p_in = (pchi2 <= pthr) & depth_ok & prob.pobs_mask
    lchi2 = line_chi2(prob1, intr)
    lthr = jnp.where(prob1.lobs_stereo, cfg.stereo_line, cfg.mono_line)
    l_in = (lchi2 <= lthr) & prob.lobs_mask

    gated = prob1._replace(pobs_mask=p_in, lobs_mask=l_in)
    gated = optimize(gated, intr, cfg, iters2, robust=False, chunk=chunk)

    final = gated._replace(pobs_mask=prob.pobs_mask, lobs_mask=prob.lobs_mask)
    pchi2, depth_ok = point_chi2(final, intr)
    p_in = (pchi2 <= pthr) & depth_ok & prob.pobs_mask
    lchi2 = line_chi2(final, intr)
    l_in = (lchi2 <= lthr) & prob.lobs_mask
    return final, p_in, l_in


def build_obs_table(n_landmarks: int, lidx: np.ndarray, mask: np.ndarray,
                    n_total: int, max_obs: int) -> np.ndarray:
    """Host helper: (P, K) observation-index table (pad = n_total)."""
    table = np.full((n_landmarks, max_obs), n_total, np.int32)
    counts = np.zeros(n_landmarks, np.int32)
    for oi in np.nonzero(mask)[0]:
        li = lidx[oi]
        if counts[li] < max_obs:
            table[li, counts[li]] = oi
            counts[li] += 1
    return table

def dense_to_sparse(prob: "gn.BAProblem", max_obs: int = 16,
                    dtype=None) -> SparseBAProblem:
    """Convert a dense-grid ``gn.BAProblem`` (point observations) to the
    observation-list form. Host-side utility for handing a window problem to
    the map-scale solver (and for equivalence tests / the multichip dryrun).

    ``dtype=None`` selects f64 when x64 is enabled, else the problem's own
    dtype — requesting f64 in a non-x64 process emits truncation warnings."""
    if dtype is None:
        dtype = (jnp.float64 if jax.config.jax_enable_x64
                 else prob.points.dtype)
    obs = np.asarray(prob.point_obs)
    mask = np.asarray(prob.point_obs_mask)
    P, F = mask.shape
    pi, fi = np.nonzero(mask)
    n = len(pi)
    ppidx = pi.astype(np.int32)
    pfidx = fi.astype(np.int32)
    pobs = obs[pi, fi]
    pmask = np.ones(n, bool)
    table = build_obs_table(P, ppidx, pmask, n, max_obs)
    L = prob.lines.shape[0]
    return SparseBAProblem(
        Rwb=prob.frames.Rwb.astype(dtype), twb=prob.frames.twb.astype(dtype),
        pose_fixed=prob.pose_fixed,
        points=prob.points.astype(dtype),
        pobs_pidx=jnp.asarray(ppidx), pobs_fidx=jnp.asarray(pfidx),
        pobs=jnp.asarray(pobs, dtype), pobs_mask=jnp.asarray(pmask),
        point_obs_table=jnp.asarray(table),
        lines=prob.lines.astype(dtype),
        lobs_lidx=jnp.zeros(1, jnp.int32), lobs_fidx=jnp.zeros(1, jnp.int32),
        lobs=jnp.zeros((1, 8), dtype), lobs_stereo=jnp.zeros(1, bool),
        lobs_mask=jnp.zeros(1, bool), lobs_sigma=jnp.full((1,), 0.001, dtype),
        line_obs_table=jnp.full((L, 1), 1, jnp.int32),
        Rcb=prob.Rcb.astype(dtype), tcb=prob.tcb.astype(dtype),
        g_value=prob.g_value,
    )

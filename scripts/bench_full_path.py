"""Measured FULL per-frame device compute path: stereo frontend (detect both
views + stereo match) + temporal LightGlue match against the last keyframe +
pose-only tracking optimization (3×10 GN rounds, the FrameOptimization
equivalent) — all inside ONE jitted graph, timed with the bench.py
scan-slope methodology (T=16/T=256 differenced slope, min-of-5, DCE-proof
carry).

This is everything the per-frame hot loop runs on device
(map_builder.cc:56-228 feature + tracking threads); what it excludes is only
host-side map bookkeeping.

``--full-system`` goes further and MEASURES the amortized full-system rate as
ONE number from ONE scanned graph: the frame path every step plus the
local-BA window (the per-keyframe cost) every k-th step behind a ``lax.cond``,
with k = the measured keyframe cadence of the e2e loop run. Nothing is
composed from separately-benched times (the reference's 73 Hz is likewise one
measured program, demo/visual_odometry.cpp:49-58).

The tunnel container cannot measure the host loop meaningfully (every
dispatch pays a ~40 ms network round trip and the VM has one CPU core — see
apps/benchmark_system.py for the per-stage evidence of that artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_HZ = 73.0  # full system, /root/reference/README.md:33
# MEASURED keyframe cadence of the 40-frame e2e loop run (visual_odometry.py
# logs "keyframe rate: 21/40 = 0.525", bright vision run, round 4 — the dark
# VIO run measured the same 21/40): one keyframe every ~2nd frame. This loop
# trajectory turns continuously, so it keyframes far more often than the 0.2
# the reference policy yields on EuRoC straightaways — so the cadence itself
# is conservative relative to EuRoC. The full-system scan runs BA at this
# EXACT fractional cadence (21 BA steps per 40 frames via an integer-floor
# keyframe predicate) — the earlier k=2 integer rounding ran BA once per 2.0
# frames instead of the measured 1.90, flattering the amortized Hz by ~2%
# (advisor r4). --kf-every k forces the integer cadence for comparability.
MEASURED_KF_NUM = 21
MEASURED_KF_DEN = 40


def build_full_step(vi: bool = False):
    """``vi=True`` swaps the tracking solver for the visual-inertial variant
    (F=2 with the fixed last keyframe, one IMU factor, 15-dof fast path)."""
    from __graft_entry__ import entry
    from airslam_tpu.backend import gn, windows
    from airslam_tpu.core.camera import Intrinsics
    from airslam_tpu.models.lightglue import normalize_keypoints
    from airslam_tpu.ops.match import mutual_match

    frontend_step, (plp, loip, lgp, pair0) = entry()
    h, w = 480, 752
    K = 400  # max keypoints (vo_euroc.yaml)

    from airslam_tpu.frontend.matcher import MatcherConfig, PointMatcher
    from airslam_tpu.models import weights as wio

    mckpt = wio.checkpoint_path("lightglue.npz")
    mat_params = wio.load_params(mckpt) if os.path.exists(mckpt) else None
    pm = PointMatcher(MatcherConfig(matcher=0, max_keypoints=K, dtype=jnp.bfloat16),
                      params=mat_params, seed=0)
    lg_apply = pm.model.apply

    dt = jnp.float32
    intr = Intrinsics(fx=jnp.asarray(458.0, dt), fy=jnp.asarray(458.0, dt),
                      cx=jnp.asarray(376.0, dt), cy=jnp.asarray(240.0, dt),
                      bf=jnp.asarray(45.8, dt))
    cfg = gn.BAConfig()

    def full_step(plp, loip, lgp, kf, landmarks, stereo_pair):
        """kf: (desc (K,256), nk (K,2), mask (K,)) of the last keyframe;
        landmarks: (K, 3) mappoint positions aligned with kf slots."""
        (f0kp, f1kp, st_idx, st_score, lines, line_mask,
         cur_desc, cur_mask, juncs, junc_desc, junc_mask) = frontend_step(
            plp, loip, lgp, stereo_pair)
        kf_desc, kf_nk, kf_mask = kf
        nk0 = normalize_keypoints(f0kp, w, h, 0.5)
        scores_t, _, _ = lg_apply(lgp, kf_nk,
                                  kf_desc.astype(cur_desc.dtype), kf_mask,
                                  nk0, cur_desc, cur_mask)
        mt = mutual_match(scores_t, kf_mask, cur_mask, 0.1)

        # pose-only problem: kf slot i ↔ current keypoint mt.idx1[i]
        idx = jnp.clip(mt.idx1, 0, K - 1)
        uv = jnp.take(f0kp, idx, axis=0).astype(dt)  # (K, 2)
        F = 2 if vi else 1
        cur = F - 1
        obs = jnp.zeros((K, F, 3), dt).at[..., 2].set(-1.0)
        obs = obs.at[:, cur, :2].set(uv)
        mask = jnp.zeros((K, F), bool).at[:, cur].set(mt.mask)
        eye = jnp.eye(3, dtype=dt)
        imu = None
        if vi:
            imu = gn.IMUFactors(
                idx_i=jnp.asarray([0], jnp.int32), idx_j=jnp.asarray([1], jnp.int32),
                dR=eye[None], dV=jnp.zeros((1, 3), dt), dP=jnp.zeros((1, 3), dt),
                JRg=jnp.zeros((1, 3, 3), dt), JVg=jnp.zeros((1, 3, 3), dt),
                JVa=jnp.zeros((1, 3, 3), dt), JPg=jnp.zeros((1, 3, 3), dt),
                JPa=jnp.zeros((1, 3, 3), dt),
                bg_lin=jnp.zeros((1, 3), dt), ba_lin=jnp.zeros((1, 3), dt),
                dT=jnp.asarray([0.25], dt),
                info=jnp.asarray(np.eye(9, dtype=np.float32)[None] * 50.0),
                info_walk=jnp.asarray(np.eye(6, dtype=np.float32)[None] * 1e4),
                mask=jnp.asarray([True]))
        problem = gn.BAProblem(
            frames=gn.FrameStates(
                Rwb=jnp.broadcast_to(eye, (F, 3, 3)), twb=jnp.zeros((F, 3), dt),
                vel=jnp.zeros((F, 3), dt), bg=jnp.zeros((F, 3), dt),
                ba=jnp.zeros((F, 3), dt)),
            pose_fixed=jnp.asarray([True] * (F - 1) + [False]),
            vel_fixed=jnp.asarray([True] * (F - 1) + [not vi]),
            points=landmarks.astype(dt), point_fixed=jnp.ones(K, bool),
            point_obs=obs, point_obs_mask=mask,
            lines=jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]], dt),
            line_fixed=jnp.ones(1, bool),
            line_obs=jnp.zeros((1, F, 8), dt), line_obs_stereo=jnp.zeros((1, F), bool),
            line_obs_mask=jnp.zeros((1, F), bool),
            line_obs_sigma=jnp.full((1, F), 0.5, dt),
            Rwg=eye, gravity_free=jnp.asarray(0.0, dt), imu=imu,
            Rcb=eye, tcb=jnp.zeros(3, dt),
        )
        out, p_in, _, n_in = windows.pose_only_optimization(
            problem, intr, cfg, vi_tracking=True if vi else None)
        return (f0kp, f1kp, st_idx, st_score, lines, line_mask,
                out.frames.Rwb, out.frames.twb, out.frames.vel, n_in, mt.score,
                juncs, junc_desc, junc_mask)

    rng = np.random.RandomState(0)
    kf = (jnp.asarray(rng.randn(K, 256).astype(np.float32)),
          jnp.asarray(rng.rand(K, 2).astype(np.float32) * 2 - 1),
          jnp.ones(K, bool))
    landmarks = jnp.asarray(rng.randn(K, 3).astype(np.float32) * 2 + [0, 0, 6])
    return full_step, (plp, loip, lgp, kf, landmarks)


def build_local_ba_window(vi: bool = False):
    """The e2e local-BA window at the exact padded shapes the map builder
    compiles (slam/map.py:29-30,301: F = WINDOW_SIZE(5) + MAX_FIXED_FRAMES(10)
    = 15, P bucketed to 256, L bucketed to 32): 5 free recent poses, 10 fixed
    observers, stereo point observations, masked line pad rows (line rows cost
    compute regardless of mask — static shapes).

    ``vi=True`` adds the IMU chain the stereo-inertial window carries
    (slam/map.py::_imu_factors; the reference's LocalmapOptimization carries
    IMU edges between consecutive window keyframes,
    g2o_optimization.cc:79-444): 5 factors linking the last fixed observer
    through the 5 free frames, free velocities/biases on the free frames —
    the full 15-dof-per-frame system with gravity fixed."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from synthetic import make_point_scene, build_problem
    from airslam_tpu.core.camera import Intrinsics
    from airslam_tpu.backend import gn

    rng = np.random.RandomState(0)
    scene = make_point_scene(f=15, p=256, rng=rng)
    pose_fixed = np.zeros(15, bool)
    pose_fixed[:10] = True
    lines = np.tile(np.asarray([1.0, 0, 0, 0, 1.0, 0], np.float32), (32, 1))
    prob = build_problem(scene, pose_fixed=pose_fixed, lines=lines,
                         dtype=jnp.float32)
    if vi:
        k = 5
        eye = np.eye(3, dtype=np.float32)
        imu = gn.IMUFactors(
            idx_i=jnp.asarray(np.arange(9, 14), jnp.int32),
            idx_j=jnp.asarray(np.arange(10, 15), jnp.int32),
            dR=jnp.asarray(np.tile(eye, (k, 1, 1))),
            dV=jnp.asarray(rng.randn(k, 3).astype(np.float32) * 0.01),
            dP=jnp.asarray(rng.randn(k, 3).astype(np.float32) * 0.05),
            JRg=jnp.zeros((k, 3, 3), jnp.float32),
            JVg=jnp.zeros((k, 3, 3), jnp.float32),
            JVa=jnp.zeros((k, 3, 3), jnp.float32),
            JPg=jnp.zeros((k, 3, 3), jnp.float32),
            JPa=jnp.zeros((k, 3, 3), jnp.float32),
            bg_lin=jnp.zeros((k, 3), jnp.float32),
            ba_lin=jnp.zeros((k, 3), jnp.float32),
            dT=jnp.full((k,), 0.25, jnp.float32),
            info=jnp.asarray(np.tile(np.eye(9, dtype=np.float32) * 50.0,
                                     (k, 1, 1))),
            info_walk=jnp.asarray(np.tile(np.eye(6, dtype=np.float32) * 1e4,
                                          (k, 1, 1))),
            mask=jnp.ones((k,), bool),
        )
        vel_fixed = np.ones(15, bool)
        vel_fixed[10:] = False
        prob = prob._replace(imu=imu, vel_fixed=jnp.asarray(vel_fixed))
    i64 = scene["intr"]
    intr = Intrinsics(fx=i64.fx.astype(jnp.float32), fy=i64.fy.astype(jnp.float32),
                      cx=i64.cx.astype(jnp.float32), cy=i64.cy.astype(jnp.float32),
                      bf=i64.bf.astype(jnp.float32), width=752, height=480)
    return prob, intr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t_lo", type=int, default=16)
    ap.add_argument("--t_hi", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--vi", action="store_true",
                    help="visual-inertial tracking variant (15-dof solver)")
    ap.add_argument("--full-system", action="store_true", dest="full_system",
                    help="MEASURE (not compose) the amortized full-system "
                         "rate: one scanned graph running the frame path "
                         "every step plus the local-BA window every k-th "
                         "step via lax.cond")
    ap.add_argument("--kf-every", type=int, default=0, dest="kf_every",
                    help="k for --full-system; 0 = the measured keyframe "
                         "rate of the e2e loop run (visual_odometry.py "
                         "logs 'keyframe rate: ...')")
    args = ap.parse_args()

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()
    full_step, (plp, loip, lgp, kf, landmarks) = build_full_step(vi=args.vi)

    if args.full_system:
        run_full_system(args, full_step, (plp, loip, lgp, kf, landmarks))
        return

    run_frame_path(args, full_step, (plp, loip, lgp, kf, landmarks))


def run_full_system(args, full_step, fs_args):
    """One scanned graph = frame path every step + the local-BA window every
    k-th step (lax.cond — XLA conditionals execute one branch, so the BA cost
    lands only on keyframe steps). The slope of this scan IS the amortized
    full-system rate; nothing is composed from separately-benched numbers.
    k defaults to the measured keyframe rate of the 40-frame e2e loop run
    (visual_odometry.py 'keyframe rate:' log). Scan lengths are multiples of
    k so both scans run exactly T/k BA steps."""
    from airslam_tpu.backend import windows

    plp, loip, lgp, kf, landmarks = fs_args
    prob, intr_ba = build_local_ba_window(vi=args.vi)

    # Cadence: by default the EXACT measured rate (21 keyframes / 40 frames,
    # one per 1.90 frames) via the integer-floor predicate below — no k=2
    # rounding flattery (advisor r4). --kf-every k overrides with the integer
    # cadence for comparability with older artifacts.
    if args.kf_every:
        num, den = 1, args.kf_every
    else:
        num, den = MEASURED_KF_NUM, MEASURED_KF_DEN

    @jax.jit
    def run_frames(plp, loip, lgp, kf, landmarks, frames, seed):
        def body(carry, pair):
            c, step = carry
            out = full_step(plp, loip, lgp, kf, landmarks, pair + c * 1e-3)
            c2 = sum(jnp.sum(o.astype(jnp.float32))
                     for o in jax.tree_util.tree_leaves(out)) * 1e-9

            def ba(x):
                p2 = prob._replace(point_obs=prob.point_obs + x * 1e-12)
                outp, pi, li = windows.local_ba(p2, intr_ba)
                # consume every output — DCE-proof (see bench.py)
                return (jnp.sum(outp.frames.twb) * 1e-9
                        + jnp.sum(pi) * 1e-12 + jnp.sum(li) * 1e-12
                        ).astype(jnp.float32)

            # keyframe at step s iff floor((s+1)·num/den) > floor(s·num/den)
            # — exactly num BA steps per den frames
            is_kf = ((step + 1) * num) // den > (step * num) // den
            cba = jax.lax.cond(is_kf, ba, lambda x: x * 0.0, c2)
            return ((c2 + cba + seed).astype(jnp.float32),
                    step + jnp.asarray(1, jnp.int32)), None

        init = (seed, jnp.asarray(0, jnp.int32))
        (c, _), _ = jax.lax.scan(body, init, frames)
        return c

    # whole cadence periods so both scans run an exact multiple of num BA steps
    t_lo = den * max(1, -(-16 // den))
    t_hi = den * max(6, -(-240 // den))
    rng = np.random.RandomState(1)
    times = {t_lo: [], t_hi: []}
    frames_of = {}
    for T in (t_lo, t_hi):
        frames_of[T] = jnp.asarray(rng.rand(T, 2, 480, 752).astype(np.float32))
        c = run_frames(plp, loip, lgp, kf, landmarks, frames_of[T],
                       jnp.asarray(0.0, jnp.float32))
        _ = float(np.asarray(c))
    for rep in range(args.reps):
        for T in (t_lo, t_hi):  # interleaved — both estimates see the same
            seed = jnp.asarray(1e-5 * (rep + 1), jnp.float32)  # tunnel phases
            t0 = time.perf_counter()
            c = run_frames(plp, loip, lgp, kf, landmarks, frames_of[T], seed)
            _ = float(np.asarray(c))
            times[T].append(time.perf_counter() - t0)
    best = {T: min(v) for T, v in times.items()}
    med = {T: float(np.median(v)) for T, v in times.items()}
    dt = (best[t_hi] - best[t_lo]) / (t_hi - t_lo)
    dt_med = (med[t_hi] - med[t_lo]) / (t_hi - t_lo)
    print(json.dumps({
        "metric": ("full_system_vi_hz_per_chip" if args.vi
                   else "full_system_hz_per_chip"),
        "value": round(1.0 / dt, 2),
        "unit": ("Hz @752x480 — MEASURED single scanned graph: detect x2 + "
                 "stereo match + temporal match + pose-only GN"
                 + (" (VI 15-dof + IMU factor)" if args.vi else "")
                 + " every frame, local BA (F=15 pad, P=256, L=32"
                 + (", 5-factor IMU chain" if args.vi else "")
                 + f", 5+15 LM iters) on {num} of every {den} frames via "
                 "lax.cond (exact measured cadence)"),
        "kf_rate": round(num / den, 4),
        "median_hz": round(1.0 / dt_med, 2),
        "scan_s_min": {str(T): round(best[T], 4) for T in (t_lo, t_hi)},
        "scan_s_median": {str(T): round(med[T], 4) for T in (t_lo, t_hi)},
        "reps": args.reps,
        "vs_reference_full_system": round(1.0 / dt / REFERENCE_HZ, 3),
    }))


def run_frame_path(args, full_step, fs_args):
    plp, loip, lgp, kf, landmarks = fs_args

    @jax.jit
    def run_frames(plp, loip, lgp, kf, landmarks, frames, seed):
        def body(c, pair):
            out = full_step(plp, loip, lgp, kf, landmarks, pair + c * 1e-3)
            c2 = sum(jnp.sum(o.astype(jnp.float32))
                     for o in jax.tree_util.tree_leaves(out))
            return (c2 * 1e-9 + seed).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, seed, frames)
        return c

    rng = np.random.RandomState(1)
    best = {}
    for T in (args.t_lo, args.t_hi):
        frames = jnp.asarray(rng.rand(T, 2, 480, 752).astype(np.float32))
        c = run_frames(plp, loip, lgp, kf, landmarks, frames,
                       jnp.asarray(0.0, jnp.float32))
        _ = float(np.asarray(c))
        times = []
        for rep in range(args.reps):
            seed = jnp.asarray(1e-5 * (rep + 1), jnp.float32)
            t0 = time.perf_counter()
            c = run_frames(plp, loip, lgp, kf, landmarks, frames, seed)
            _ = float(np.asarray(c))
            times.append(time.perf_counter() - t0)
        best[T] = min(times)

    dt = (best[args.t_hi] - best[args.t_lo]) / (args.t_hi - args.t_lo)
    hz = 1.0 / dt
    print(json.dumps({
        "metric": ("frame_compute_path_vi_hz_per_chip" if args.vi
                   else "frame_compute_path_hz_per_chip"),
        "value": round(hz, 2),
        "unit": "Hz @752x480 (detect x2 + stereo match + temporal match + pose-only GN 3x10, one graph)",
        "vs_reference_full_system": round(hz / REFERENCE_HZ, 3),
    }))


if __name__ == "__main__":
    main()

"""Measured FULL per-frame device compute path: stereo frontend (detect both
views + stereo match) + temporal LightGlue match against the last keyframe +
pose-only tracking optimization (3×10 GN rounds, the FrameOptimization
equivalent) — all inside ONE jitted graph, timed with the bench.py
scan-slope methodology (T=16/T=256 differenced slope, min-of-5, DCE-proof
carry).

This is everything the per-frame hot loop runs on device
(map_builder.cc:56-228 feature + tracking threads); what it excludes is only
host-side map bookkeeping. Together with the per-keyframe local-BA time
(apps/bench_backend.py) it gives an honest amortized full-system rate:

    1 / (t_frame + keyframe_rate * t_local_ba)

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
KEYFRAME_RATE = 0.2  # ~1 keyframe per 5 frames (reference keyframe policy)


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t_lo", type=int, default=16)
    ap.add_argument("--t_hi", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--vi", action="store_true",
                    help="visual-inertial tracking variant (15-dof solver)")
    args = ap.parse_args()

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()
    full_step, (plp, loip, lgp, kf, landmarks) = build_full_step(vi=args.vi)

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
    # amortized full system with local BA at keyframe rate (8.5 ms measured
    # by apps/bench_backend.py on the same chip, f32 15-frame padded window)
    t_ba = 8.5e-3
    amortized = 1.0 / (dt + KEYFRAME_RATE * t_ba)
    print(json.dumps({
        "metric": ("frame_compute_path_vi_hz_per_chip" if args.vi
                   else "frame_compute_path_hz_per_chip"),
        "value": round(hz, 2),
        "unit": "Hz @752x480 (detect x2 + stereo match + temporal match + pose-only GN 3x10, one graph)",
        "amortized_full_system_hz": round(amortized, 2),
        "vs_reference_full_system": round(amortized / REFERENCE_HZ, 3),
    }))


if __name__ == "__main__":
    main()

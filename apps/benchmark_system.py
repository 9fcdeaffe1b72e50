"""FULL-SYSTEM throughput + accuracy benchmark on a synthetic 3D sequence
with the real CNN pipeline (detector + matcher + tracking + BA + map
bookkeeping) — the apples-to-apples number against the reference's 73 Hz
full-system claim (/root/reference/README.md:33; FPS print
demo/visual_odometry.cpp:49-58).

A consistent 3D wireframe-and-dots world is rasterized into a stereo ASL-like
sequence on device (airslam_tpu.frontend.synthgen.render_view3d), then
MapBuilder runs exactly as in apps/visual_odometry.py. Reports frames/s,
per-stage breakdown, and ATE RMSE against the ground-truth trajectory.

--profile writes a jax.profiler trace (SURVEY §5 tracing gap).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def traj_position(t, traj: str = "forward", total: float = None):
    """Analytic trajectory position at time t (seconds). ``forward``: smooth
    forward + weave; ``loop``: out-and-back along z (returns to the start —
    exercises loop closure); ``wide``: the same z out-and-back traversed
    TWICE while the lateral position sweeps ±1.5 m (one sine period) — a
    wider-COVERAGE map over the same world, used by
    scripts/measure_reloc_envelope.py to test causally whether world
    coverage (not retrieval) bounds the relocalization envelope (round-4
    verdict item 8). Twin of :func:`apps.make_synth_dataset.traj_accel`."""
    x = 0.3 * np.sin(1.6 * t)
    y = 0.08 * np.sin(2.6 * t)
    if traj == "forward":
        z = 2.4 * t
    elif traj == "wide":
        w = 2.0 * np.pi / total
        x = x + 1.5 * np.sin(w * t)
        z = 2.0 * (1.0 - np.cos(2.0 * w * t))
    else:
        z = 2.0 * (1.0 - np.cos(2.0 * np.pi * t / total))
    return np.stack(np.broadcast_arrays(x, y, z), axis=-1)


def make_sequence(n_frames: int, height: int, width: int, seed: int = 0,
                  baseline: float = 0.11, stride: int = 1,
                  traj: str = "forward", texture: float = 0.0,
                  photometric: str = "none", intrinsics=None):
    """Render a stereo sequence along an analytic trajectory.
    Returns (timestamps, lefts (T,H,W), rights, gt_Twc list). ``stride``
    subsamples the 20 Hz trajectory (stride 2 = 10 Hz frames) — same analytic
    path, longer wall-clock span per rendered frame. ``texture`` adds 1/f
    plane texture (natural-image statistics); ``photometric='dark'`` applies
    the gamma-crushed low-light transform per frame (dark-EuRoC stand-in).
    ``intrinsics``: optional (fx, fy, cx, cy) override — the distorted-rig
    dataset renders with the RECTIFIED intrinsics of its stereoRectify."""
    import jax
    import jax.numpy as jnp

    from airslam_tpu.frontend import synthgen
    from tests.synthetic import default_intrinsics

    if intrinsics is not None:
        fx, fy, cx, cy = (float(v) for v in intrinsics)
    else:
        intr = default_intrinsics(jnp.float32)
        fx, fy, cx, cy = (float(intr.fx), float(intr.fy), float(intr.cx), float(intr.cy))

    world = synthgen.make_world3d(jax.random.PRNGKey(seed))
    tex_key = jax.random.PRNGKey(seed + 31)
    ts = np.arange(n_frames) * 0.05 * stride
    total = float(n_frames * 0.05 * stride)
    gt = []
    for k in range(n_frames):
        T = np.eye(4)
        T[:3, 3] = traj_position(ts[k], traj, total)
        gt.append(T)

    @jax.jit
    def render_seq(Rcw_all, tcw_all, tcw_all_r, keys):
        def one(Rcw, tcw, tcw_r, k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            L = synthgen.render_view3d(world, Rcw, tcw, fx, fy, cx, cy,
                                       height, width, k1,
                                       texture=texture, texture_key=tex_key)
            R = synthgen.render_view3d(world, Rcw, tcw_r, fx, fy, cx, cy,
                                       height, width, k2,
                                       texture=texture, texture_key=tex_key)
            if photometric == "dark":
                L = synthgen.dark_transform(k3, L)
                R = synthgen.dark_transform(k4, R)
            return L, R

        return jax.lax.map(lambda args: one(*args), (Rcw_all, tcw_all, tcw_all_r, keys))

    Rcw = np.stack([T[:3, :3].T for T in gt])
    tcw = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt])
    # right camera center = left + baseline along camera +x ⇒ tcw' = tcw − b·ex
    tcw_r = tcw.copy()
    tcw_r[:, 0] -= baseline
    keys = jax.vmap(jax.random.fold_in, (None, 0))(jax.random.PRNGKey(seed + 1),
                                                   jnp.arange(n_frames))
    L, R = render_seq(jnp.asarray(Rcw, jnp.float32), jnp.asarray(tcw, jnp.float32),
                      jnp.asarray(tcw_r, jnp.float32), keys)
    return ts, np.asarray(L), np.asarray(R), gt


class SynthCamera:
    """Camera facade with the synthetic intrinsics (no distortion)."""

    def __init__(self, height, width, baseline=0.11):
        import jax.numpy as jnp

        from tests.synthetic import default_intrinsics

        intr = default_intrinsics(jnp.float64)
        self.fx, self.fy = float(intr.fx), float(intr.fy)
        self.cx, self.cy = float(intr.cx), float(intr.cy)
        self.bf = self.fx * baseline
        self.image_width, self.image_height = width, height
        self.depth_lower_thr, self.depth_upper_thr = 0.5, 25.0
        self.max_x_diff = self.bf / self.depth_lower_thr
        self.min_x_diff = self.bf / self.depth_upper_thr
        self.max_y_diff = 2.0
        self.Tbc = np.eye(4)
        self.Tcb = np.eye(4)
        self.use_imu = False
        self.g_value = 9.81

    def intrinsics(self, dtype=None):
        import jax.numpy as jnp

        from airslam_tpu.core.camera import Intrinsics

        dtype = dtype or jnp.float64
        return Intrinsics(
            fx=jnp.asarray(self.fx, dtype), fy=jnp.asarray(self.fy, dtype),
            cx=jnp.asarray(self.cx, dtype), cy=jnp.asarray(self.cy, dtype),
            bf=jnp.asarray(self.bf, dtype),
        )

    def rectify_maps(self):
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=752)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--profile", default=None,
                    help="directory for a jax.profiler trace of the run")
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--pipelined", action="store_true")
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    import jax.numpy as jnp

    from airslam_tpu.frontend.detector import DetectorConfig, FeatureDetector
    from airslam_tpu.frontend.matcher import MatcherConfig, PointMatcher
    from airslam_tpu.io.trajectory import ate_rmse
    from airslam_tpu.models import weights as wio
    from airslam_tpu.pipelines.map_builder import MapBuilder
    from airslam_tpu.utils.timing import Timer

    print(f"rendering {args.frames}-frame synthetic stereo sequence...", flush=True)
    ts, lefts, rights, gt = make_sequence(args.frames, args.height, args.width)

    det_cfg = DetectorConfig(max_keypoints=400, use_superpoint=False,
                             dtype=jnp.bfloat16)
    det_params, mat_params = wio.load_default_frontend(use_superpoint=False)
    if det_params is not None:
        print("loaded trained detector/matcher checkpoints")
    detector = FeatureDetector(det_cfg, params=det_params)
    matcher = PointMatcher(MatcherConfig(matcher=0, max_keypoints=400,
                                         dtype=jnp.bfloat16), params=mat_params)
    cam = SynthCamera(args.height, args.width)
    builder = MapBuilder(cam, detector, matcher)
    timer = Timer()
    builder.stage_timer = timer

    # warm up compiles outside the timed loop
    builder.add_input(ts[0], lefts[0], rights[0], None)

    if args.profile:
        os.makedirs(args.profile, exist_ok=True)
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    if args.pipelined:
        from airslam_tpu.pipelines.map_builder import PipelinedRunner

        class _Seq:
            def __len__(self):
                return args.frames - 1

            def get(self, i):
                return ts[i + 1], lefts[i + 1], rights[i + 1], None

        PipelinedRunner(builder).run(_Seq())
    else:
        for i in range(1, args.frames):
            builder.add_input(ts[i], lefts[i], rights[i], None)
    elapsed = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}")

    n = args.frames - 1
    hz = n / elapsed
    est = builder.trajectory
    gt_traj = [(ts[i], gt[i]) for i in range(args.frames)]
    try:
        ate = ate_rmse(est, gt_traj, align=True)
    except Exception as e:  # degenerate tracking
        ate = float("nan")
        print(f"ATE failed: {e}")

    print(f"\nfull-system: {hz:.2f} Hz ({1e3 / hz:.1f} ms/frame) over {n} frames")
    print(f"keyframes: {len(builder.map.keyframes)}  mappoints: {len(builder.map.mappoints)}")
    print(f"ATE RMSE (aligned): {ate * 100:.2f} cm over {0.12 * args.frames:.1f} m")
    print("\nper-stage breakdown:")
    print(timer.summary())
    if args.json:
        print(json.dumps({
            "metric": "full_system_hz", "value": round(hz, 2),
            "unit": "Hz full VO system @752x480 synthetic",
            "vs_baseline": round(hz / 73.0, 3), "ate_cm": round(ate * 100, 2),
        }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Visual(-inertial) odometry / mapping CLI.

Equivalent of ``demo/visual_odometry.cpp`` + ``launch/visual_odometry/*``:
consumes the reference's YAML configs unchanged, runs the VO pipeline over an
ASL/EuRoC dataset, writes the TUM trajectory and the v0 map.

Usage:
  python apps/visual_odometry.py --config_path configs/vo_euroc.yaml \\
      --camera_config_path configs/camera/euroc.yaml \\
      --dataroot /data/euroc/MH_01/mav0 --saving_dir ./out [--model_dir weights/]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--camera_config_path", required=True)
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--saving_dir", required=True)
    ap.add_argument("--model_dir", default=None, help="directory with *.npz weights")
    ap.add_argument("--traj_path", default=None)
    ap.add_argument("--max_frames", type=int, default=0)
    ap.add_argument("--pipelined", action="store_true",
                    help="double-buffer device detection with host tracking")
    ap.add_argument("--mesh_pipelined", action="store_true",
                    help="frame-parallel chunked detection over every device "
                         "in the mesh, overlapped with host tracking")
    ap.add_argument("--jax_pnp", action="store_true",
                    help="device-resident RANSAC PnP instead of cv2")
    from airslam_tpu.utils import device as device_util

    device_util.add_arg(ap)
    args = ap.parse_args()
    device_util.select(args.device)

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    from airslam_tpu.core.camera import Camera
    from airslam_tpu.frontend.detector import FeatureDetector
    from airslam_tpu.frontend.matcher import PointMatcher
    from airslam_tpu.io.config import VisualOdometryConfigs
    from airslam_tpu.io.dataset import Dataset
    from airslam_tpu.io.serialization import save_map
    from airslam_tpu.models.weights import load_params
    from airslam_tpu.pipelines.map_builder import MapBuilder

    cfg = VisualOdometryConfigs.load(args.config_path)
    camera = Camera(args.camera_config_path)

    det_params = mat_params = None
    if args.model_dir:
        dp = os.path.join(args.model_dir, "plnet.npz")
        mp = os.path.join(args.model_dir, "lightglue.npz" if cfg.matcher.matcher == 0 else "superglue.npz")
        det_params = load_params(dp) if os.path.exists(dp) else None
        mat_params = load_params(mp) if os.path.exists(mp) else None
    if det_params is None or mat_params is None:
        from airslam_tpu.models.weights import load_default_frontend

        d0, m0 = load_default_frontend(cfg.detector.use_superpoint, cfg.matcher.matcher)
        det_params = det_params or d0
        mat_params = mat_params or m0

    detector = FeatureDetector(cfg.detector, params=det_params)
    matcher = PointMatcher(cfg.matcher, params=mat_params)
    builder = MapBuilder(camera, detector, matcher, cfg.keyframe,
                         cfg.backend_optimization, use_jax_pnp=args.jax_pnp)
    builder.map.ba_early_exit = cfg.early_exit  # opt-in (0.0 = g2o schedule)

    dataset = Dataset(args.dataroot, use_imu=camera.use_imu)
    n = len(dataset) if args.max_frames <= 0 else min(len(dataset), args.max_frames)
    print(f"dataset: {n} frames")

    t_start = time.perf_counter()
    if args.mesh_pipelined:
        from airslam_tpu.parallel.mesh import make_mesh
        from airslam_tpu.parallel.pipeline import MeshPipelinedRunner

        MeshPipelinedRunner(builder, make_mesh()).run(
            dataset, max_frames=n,
            progress=lambda i: print(f"frame {i}/{n}") if i % 50 == 0 else None,
        )
    elif args.pipelined:
        from airslam_tpu.pipelines.map_builder import PipelinedRunner

        PipelinedRunner(builder).run(
            dataset, max_frames=n,
            progress=lambda i: print(f"frame {i}/{n}") if i % 50 == 0 else None,
        )
    else:
        for i in range(n):
            ts, left, right, imu_batch = dataset.get(i)
            t0 = time.perf_counter()
            builder.add_input(ts, left, right, imu_batch)
            if i % 50 == 0:
                print(f"frame {i}/{n}  {1e3 * (time.perf_counter() - t0):.1f} ms/frame")
    elapsed = time.perf_counter() - t_start
    print(f"Average FPS: {n / elapsed:.2f}")

    os.makedirs(args.saving_dir, exist_ok=True)
    traj = args.traj_path or os.path.join(args.saving_dir, "trajectory_v0.txt")
    builder.save_trajectory(traj)
    builder.map.check_map()
    save_map(builder.map, os.path.join(args.saving_dir, "AirSLAM_mapv0.bin"))
    n_kf = len(builder.map.keyframes)
    print(f"saved {traj} and AirSLAM_mapv0.bin ({n_kf} keyframes)")
    # measured keyframe rate — consumed by scripts/bench_full_path.py
    # --full-system to amortize local BA at the rate the system actually
    # selects keyframes (reference policy: map_builder.cc AddKeyframe gates)
    print(f"keyframe rate: {n_kf}/{n} = {n_kf / max(n, 1):.3f}")


if __name__ == "__main__":
    main()

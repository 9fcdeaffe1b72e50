#!/usr/bin/env python
"""Render a synthetic stereo(-inertial) sequence to disk in EuRoC/ASL layout.

EuRoC itself is not distributable with the repo; this generates a
drop-in-format dataset so the full CLI chain (apps/visual_odometry.py →
apps/map_refinement.py → apps/relocalization.py, and apps/run_batch.py over a
root of sequences) runs end-to-end exactly as it would on EuRoC
(dataset walking: src/dataset.cc:8-64 semantics):

    <out>/<seq>/mav0/
        cam0/data/<ns>.png      left rectified grayscale
        cam1/data/<ns>.png      right (baseline 0.1 m along +x)
        imu0/data.csv           ns, gyr xyz, acc xyz (200 Hz, analytic)
        state_groundtruth_estimate0/data.csv   ns, p_xyz, q_wxyz

The world/trajectory are the system benchmark's 3D wireframe-and-dots scene
(apps/benchmark_system.py); the matching camera YAML is
configs/camera/synth_stereo.yaml (vision-only) / synth_stereo_imu.yaml (VI).

Usage: python apps/make_synth_dataset.py --out /tmp/synthds --frames 60
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMU_RATE = 200.0
FRAME_DT = 0.05  # 20 Hz frames
G_VALUE = 9.81


def traj_accel(t: np.ndarray) -> np.ndarray:
    """Analytic world acceleration of the benchmark trajectory
    p(t) = (0.3 sin(1.6 t), 0.08 sin(2.6 t), 2.4 t)."""
    return np.stack([
        -0.3 * 1.6 ** 2 * np.sin(1.6 * t),
        -0.08 * 2.6 ** 2 * np.sin(2.6 * t),
        np.zeros_like(t),
    ], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="dataset root directory")
    ap.add_argument("--seq", default="SYNTH_01")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--stride", type=int, default=1,
                    help="trajectory subsampling: 2 = 10 Hz frames over twice "
                         "the span (VI init needs >= 3 s of keyframes)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=752)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2

    from apps.benchmark_system import make_sequence

    ts, L, R, gt = make_sequence(args.frames, args.height, args.width,
                                 seed=args.seed, baseline=0.1,
                                 stride=args.stride)

    mav0 = os.path.join(args.out, args.seq, "mav0")
    for sub in ("cam0/data", "cam1/data", "imu0", "state_groundtruth_estimate0"):
        os.makedirs(os.path.join(mav0, sub), exist_ok=True)

    # EuRoC-style fixed-width (19-digit) nanosecond stamps
    EPOCH = 1_400_000_000_000_000_000

    for i in range(args.frames):
        ns = EPOCH + int(round(ts[i] * 1e9))
        for cam, img in (("cam0", L[i]), ("cam1", R[i])):
            u8 = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(mav0, cam, "data", f"{ns}.png"), u8)

    # IMU: analytic accel, zero body rates (R = I along the whole trajectory);
    # measured acc = R^T (a − g_world) = a + (0, 0, g). Covers the frame range
    # with one extra sample on each side (dataset.cc drops frames outside).
    t_imu = np.arange(-1, int(ts[-1] * IMU_RATE) + 2) / IMU_RATE
    acc = traj_accel(np.maximum(t_imu, 0.0))
    acc[:, 2] += G_VALUE
    with open(os.path.join(mav0, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for k, t in enumerate(t_imu):
            ns = EPOCH + int(round(t * 1e9))
            f.write(f"{ns},0.0,0.0,0.0,{acc[k, 0]:.9f},{acc[k, 1]:.9f},{acc[k, 2]:.9f}\n")

    with open(os.path.join(mav0, "state_groundtruth_estimate0", "data.csv"), "w") as f:
        f.write("#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
                "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n")
        for i in range(args.frames):
            ns = EPOCH + int(round(ts[i] * 1e9))
            p = gt[i][:3, 3]
            f.write(f"{ns},{p[0]:.9f},{p[1]:.9f},{p[2]:.9f},1.0,0.0,0.0,0.0\n")

    print(f"wrote {args.frames}-frame ASL sequence to {mav0}")


if __name__ == "__main__":
    main()

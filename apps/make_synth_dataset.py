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


def traj_accel(t: np.ndarray, traj: str = "forward",
               total: float = None) -> np.ndarray:
    """Analytic world acceleration — exact second derivative of
    :func:`apps.benchmark_system.traj_position`."""
    ax = -0.3 * 1.6 ** 2 * np.sin(1.6 * t)
    if traj == "forward":
        az = np.zeros_like(t)
    elif traj == "wide":
        w = 2.0 * np.pi / total
        ax = ax - 1.5 * w * w * np.sin(w * t)
        az = 2.0 * (2.0 * w) ** 2 * np.cos(2.0 * w * t)
    else:
        w = 2.0 * np.pi / total
        az = 2.0 * w * w * np.cos(w * t)
    return np.stack([
        ax,
        -0.08 * 2.6 ** 2 * np.sin(2.6 * t),
        az,
    ], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="dataset root directory")
    ap.add_argument("--seq", default="SYNTH_01")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--stride", type=int, default=1,
                    help="trajectory subsampling: 2 = 10 Hz frames over twice "
                         "the span (VI init needs >= 3 s of keyframes)")
    ap.add_argument("--traj", choices=["forward", "loop", "wide"],
                    default="forward",
                    help="loop: out-and-back along z, ends at the start "
                         "(exercises loop closure in map_refinement); wide: "
                         "the z loop twice with a ±1.5 m lateral sweep — "
                         "wider world coverage over the SAME world (reloc "
                         "envelope causal test)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=752)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hard_queries", type=int, default=0,
                    help="also render N novel-view relocalization queries "
                         "(lateral offset 0.18-0.30 m, yaw 4-9°, pitch ±3° "
                         "off the mapped trajectory) into mav0/hard0/data "
                         "with TUM ground truth in mav0/hard0/gt_tum.txt")
    ap.add_argument("--hard_offset", type=float, default=0.24,
                    help="hard-query mean lateral offset in m (sampled ±25%%)")
    ap.add_argument("--hard_yaw", type=float, default=6.5,
                    help="hard-query mean yaw in deg (sampled ±2.5)")
    ap.add_argument("--texture", type=float, default=0.0,
                    help="1/f plane-texture amplitude (e.g. 0.1): textured "
                         "floor/back-wall with exact multi-view consistency "
                         "(natural-image statistics for the CNN)")
    ap.add_argument("--photometric", choices=["none", "dark"], default="none",
                    help="dark: gamma-crushed noisy low-light rendering "
                         "(the dark-EuRoC stand-in; pair with "
                         "configs/visual_odometry/vo_euroc_dark.yaml)")
    ap.add_argument("--distort_camera", default=None,
                    help="camera YAML with distortion_type != 0 (e.g. "
                         "configs/camera/synth_stereo_distorted.yaml): render "
                         "in that rig's RECTIFIED geometry, then inverse-warp "
                         "each view into the raw distorted domain — the "
                         "pipeline must undistort on input exactly as the "
                         "reference does on EuRoC (camera.cc:161-182)")
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2

    from apps.benchmark_system import make_sequence

    intrinsics = None
    baseline = 0.1
    inv_maps = None
    if args.distort_camera:
        from airslam_tpu.core.camera import Camera

        cam = Camera(args.distort_camera)
        rect = cam.rect
        assert rect is not None, "--distort_camera needs distortion_type != 0"
        assert rect["type"] == 1, "only radtan synthesis supported"
        # with identical cams and a pure-x baseline, stereoRectify's rotations
        # are identity — the rendered (rectified) camera frame IS cam0's, so
        # the ground-truth poses need no reframing
        assert np.abs(rect["R0"] - np.eye(3)).max() < 1e-6, rect["R0"]
        assert np.abs(rect["R1"] - np.eye(3)).max() < 1e-6, rect["R1"]
        intrinsics = (cam.fx, cam.fy, cam.cx, cam.cy)  # rectified P0
        baseline = cam.bf / cam.fx
        # inverse warp: for every DISTORTED pixel, where it lands in the
        # rectified frame (undistortPoints projects through R/P) — sampling
        # the rendered rectified view there synthesizes the raw image whose
        # forward rectification (cam.map_left/right) recovers the render
        H, W = args.height, args.width
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                             np.arange(H, dtype=np.float64))
        pix = np.stack([xs, ys], -1).reshape(-1, 1, 2)
        inv_maps = {}
        for side, K, D, Rr, P in (("cam0", rect["K0"], rect["D0"], rect["R0"], rect["P0"]),
                                  ("cam1", rect["K1"], rect["D1"], rect["R1"], rect["P1"])):
            m = cv2.undistortPoints(pix, K, D, R=Rr, P=P[:3, :3])
            inv_maps[side] = m.reshape(H, W, 2).astype(np.float32)

    ts, L, R, gt = make_sequence(args.frames, args.height, args.width,
                                 seed=args.seed, baseline=baseline,
                                 stride=args.stride, traj=args.traj,
                                 texture=args.texture,
                                 photometric=args.photometric,
                                 intrinsics=intrinsics)
    if inv_maps is not None:
        L = np.stack([cv2.remap(np.asarray(L[i]), inv_maps["cam0"][..., 0],
                                inv_maps["cam0"][..., 1], cv2.INTER_LINEAR,
                                borderMode=cv2.BORDER_REPLICATE)
                      for i in range(args.frames)])
        R = np.stack([cv2.remap(np.asarray(R[i]), inv_maps["cam1"][..., 0],
                                inv_maps["cam1"][..., 1], cv2.INTER_LINEAR,
                                borderMode=cv2.BORDER_REPLICATE)
                      for i in range(args.frames)])
    total = float(args.frames * 0.05 * args.stride)

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
    acc = traj_accel(np.maximum(t_imu, 0.0), args.traj, total)
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

    if args.hard_queries > 0:
        qdir = render_hard_queries(
            mav0, args.seed, ts, gt, args.hard_queries, args.height,
            args.width, offset=args.hard_offset, yaw_deg=args.hard_yaw,
            texture=args.texture, photometric=args.photometric,
        )
        print(f"wrote {args.hard_queries} hard relocalization queries to {qdir}")

    print(f"wrote {args.frames}-frame ASL sequence to {mav0}")


def render_hard_queries(mav0, seed, ts, gt, n, height, width,
                        offset: float = 0.24, yaw_deg: float = 6.5,
                        subdir: str = "hard0", texture: float = 0.0,
                        photometric: str = "none"):
    """Render ``n`` novel-view relocalization queries off the mapped
    trajectory into ``mav0/<subdir>/data`` with TUM ground truth.
    Lateral offset is sampled in ±25% of ``offset`` (alternating sides),
    yaw in ``yaw_deg`` ± 2.5° (alternating sign), pitch ±3° — the defaults
    reproduce the original 0.18–0.30 m / 4–9° distribution; larger values
    sweep the viewpoint envelope (scripts/measure_reloc_envelope.py)."""
    import cv2
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from airslam_tpu.frontend import synthgen
    from tests.synthetic import default_intrinsics

    EPOCH = 1_400_000_000_000_000_000
    intr = default_intrinsics(jnp.float32)
    fx, fy, cx, cy = (float(intr.fx), float(intr.fy),
                      float(intr.cx), float(intr.cy))
    world = synthgen.make_world3d(jax.random.PRNGKey(seed))
    qdir = os.path.join(mav0, subdir)
    os.makedirs(os.path.join(qdir, "data"), exist_ok=True)
    rng = np.random.RandomState(seed + 7)
    n_frames = len(gt)
    idxs = np.linspace(2, n_frames - 3, n).astype(int)
    rows = []
    for k, i in enumerate(idxs):
        dx = rng.uniform(0.75, 1.25) * offset * (1.0 if k % 2 == 0 else -1.0)
        dy = rng.uniform(-0.08, 0.08)
        dz = rng.uniform(-0.10, 0.10)
        yaw = np.deg2rad(rng.uniform(yaw_deg - 2.5, yaw_deg + 2.5)) * (1.0 if k % 2 else -1.0)
        pitch = np.deg2rad(rng.uniform(-3.0, 3.0))
        Rwc = (Rotation.from_euler("y", yaw) * Rotation.from_euler("x", pitch)).as_matrix()
        pos = gt[i][:3, 3] + np.array([dx, dy, dz])
        Rcw = Rwc.T
        tcw = -Rcw @ pos
        img = synthgen.render_view3d(
            world, jnp.asarray(Rcw, jnp.float32), jnp.asarray(tcw, jnp.float32),
            fx, fy, cx, cy, height, width,
            jax.random.PRNGKey(1000 + k),
            texture=texture,
            texture_key=jax.random.PRNGKey(seed + 31),
        )
        if photometric == "dark":
            img = synthgen.dark_transform(jax.random.PRNGKey(2000 + k), img)
        ns = EPOCH + int(round(ts[i] * 1e9)) + 500_000  # off-grid stamp
        u8 = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(qdir, "data", f"{ns}.png"), u8)
        rows.append((ns, pos, Rwc))
    with open(os.path.join(qdir, "gt_tum.txt"), "w") as f:
        for ns, pos, Rwc in rows:
            qx, qy, qz, qw = Rotation.from_matrix(Rwc).as_quat()
            f.write(f"{ns * 1e-9:.9f} {pos[0]:.6f} {pos[1]:.6f} {pos[2]:.6f} "
                    f"{qx:.9f} {qy:.9f} {qz:.9f} {qw:.9f}\n")
    return qdir


if __name__ == "__main__":
    main()

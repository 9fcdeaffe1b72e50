"""End-to-end SLAM on the real TPU, gated against the same run on CPU.

Closes the last round-3 "missing" item: scripts/verify_tpu.py gates the
individual compiled programs (frontend, pose GN, remap, local BA) against
CPU oracles, but the reference runs its WHOLE system on the target device
(/root/reference/demo/visual_odometry.cpp drives the TRT engines directly).
This script runs the actual mapping CLI — apps/visual_odometry.py, the same
binary the e2e tests certify on CPU — twice on an identical synthetic
sequence: once with ``--device cpu`` and once with ``--device tpu`` (the
axon tunnel), then gates

1. trajectory agreement between the two devices (ATE, no alignment — both
   start from the same canonical init pose), and
2. each device's Sim(3)-aligned ATE against the rendered ground truth, and
3. keyframe-policy agreement (the keyframe decision chain consumes detector
   scores, match counts and PnP inliers — a device-numerics bug flips it).

Writes E2E_TPU.json. Throughput through the tunnel is NOT the point here
(per-frame host pulls cost seconds on the tunnel; the measured on-chip rate
lives in bench.py / FULLSYS_TPU.json) — this artifact proves the production
pipeline computes the same map on the TPU it computes on the certified CPU
path.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _run(cmd, timeout=3600):
    t0 = time.time()
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, capture_output=True,
                       text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(
            f"{' '.join(cmd)}\n--- stdout\n{r.stdout[-3000:]}"
            f"\n--- stderr\n{r.stderr[-3000:]}")
    return r.stdout, time.time() - t0


def _load_gt(dataroot):
    rows = []
    with open(os.path.join(dataroot, "state_groundtruth_estimate0",
                           "data.csv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            v = line.strip().split(",")
            T = np.eye(4)
            T[:3, 3] = [float(x) for x in v[1:4]]
            rows.append((float(v[0]) * 1e-9, T))
    return rows


def _ate_vs_gt(traj_path, gt_rows):
    """Sim(3)-aligned ATE RMSE vs ground truth (evo_ape -as semantics,
    reference scripts/evaluation.py:96-99)."""
    from airslam_tpu.io.trajectory import ate_rmse, load_tum

    est = load_tum(traj_path)
    gt_times = np.asarray([t for t, _ in gt_rows])
    pe, pg = [], []
    for t, T in est:
        j = int(np.argmin(np.abs(gt_times - t)))
        if abs(gt_times[j] - t) < 0.02:
            pe.append((t, T))
            pg.append(gt_rows[j])
    if len(pe) < 3:
        return float("inf"), len(pe)
    return float(ate_rmse(pe, pg, align=True)), len(pe)


def _ate_between(traj_a, traj_b):
    """Unaligned ATE between two runs of the same sequence (both
    trajectories live in the canonical init-pose frame) over their common
    timestamps."""
    from airslam_tpu.io.trajectory import ate_rmse, load_tum

    a = dict((round(t, 6), T) for t, T in load_tum(traj_a))
    b = dict((round(t, 6), T) for t, T in load_tum(traj_b))
    common = sorted(set(a) & set(b))
    pa = [(t, a[t]) for t in common]
    pb = [(t, b[t]) for t in common]
    if len(common) < 3:
        return float("inf"), len(common)
    return float(ate_rmse(pa, pb, align=False)), len(common)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20,
                    help="frames to process on each device (the TPU run "
                    "costs seconds/frame in tunnel host pulls)")
    ap.add_argument("--workdir", default="/tmp/airslam_e2e_tpu")
    ap.add_argument("--reuse", action="store_true",
                    help="re-evaluate gates on already-saved trajectories")
    ap.add_argument("--out", default=os.path.join(REPO, "E2E_TPU.json"))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    dataroot = os.path.join(args.workdir, "ds", "SYNTH_01", "mav0")
    if not os.path.exists(dataroot):
        print("rendering dataset ...")
        _run(["apps/make_synth_dataset.py", "--out",
              os.path.join(args.workdir, "ds"), "--frames", "40",
              "--stride", "2", "--traj", "loop"])

    vo = ["apps/visual_odometry.py",
          "--config_path", "configs/visual_odometry/vo_euroc.yaml",
          "--camera_config_path", "configs/camera/synth_stereo.yaml",
          "--dataroot", dataroot,
          "--max_frames", str(args.frames)]

    runs = {}
    for dev in ("cpu", "tpu"):
        out_dir = os.path.join(args.workdir, f"out_{dev}")
        traj = os.path.join(out_dir, "trajectory_v0.txt")
        kf_path = os.path.join(out_dir, "keyframes.txt")
        if args.reuse and os.path.exists(traj) and os.path.exists(kf_path):
            kf, dt = int(open(kf_path).read()), 0.0
            print(f"reusing {dev} run: {kf} keyframes")
        else:
            print(f"running visual_odometry on {dev} "
                  f"({args.frames} frames) ...")
            stdout, dt = _run(vo + ["--saving_dir", out_dir, "--device", dev])
            kf = None
            for line in stdout.splitlines():
                if line.startswith("keyframe rate:"):
                    kf = int(line.split(":")[1].split("/")[0])
            with open(kf_path, "w") as f:
                f.write(str(kf))
            print(f"  {dev}: {kf} keyframes, {dt:.0f}s wall")
        runs[dev] = {"traj": traj, "keyframes": kf, "wall_s": round(dt, 1)}

    gt = _load_gt(dataroot)
    checks = []

    def check(name, value, gate, op="<="):
        ok = (value <= gate) if op == "<=" else (value >= gate)
        checks.append({"name": name, "value": round(float(value), 5),
                       "gate": gate, "op": op, "pass": bool(ok)})
        print(f"{'OK ' if ok else 'FAIL'} {name}: {value:.5f} ({op} {gate})")

    ate_cross, n_common = _ate_between(runs["tpu"]["traj"], runs["cpu"]["traj"])
    ate_cpu, n_cpu = _ate_vs_gt(runs["cpu"]["traj"], gt)
    ate_tpu, n_tpu = _ate_vs_gt(runs["tpu"]["traj"], gt)

    # Cross-device gate: the bf16 frontend perturbs keypoints ~0.1 px vs the
    # f32 CPU run, and those sub-pixel differences compound CHAOTICALLY
    # through RANSAC inlier sets, chi² gates and keyframe thresholds over 20
    # tracked frames — two correct runs cannot agree to machine epsilon. A
    # real device-numerics bug manifests as blown tracking (the vs-GT gates
    # below, both tighter than the 0.10 m the CPU e2e suite uses,
    # tests/test_e2e_cli.py:93), flipped keyframe decisions, or
    # many-centimeter divergence; measured cross-ATE is ~4 cm unaligned on
    # the 4 m loop (the unaligned metric includes end-pose heading drift).
    check("ate_tpu_vs_cpu_m", ate_cross, 0.05)
    check("ate_cpu_vs_gt_m", ate_cpu, 0.05)
    check("ate_tpu_vs_gt_m", ate_tpu, 0.05)
    check("keyframe_count_delta", abs(runs["tpu"]["keyframes"]
                                      - runs["cpu"]["keyframes"]), 1)

    ok = all(c["pass"] for c in checks)
    artifact = {
        "ok": ok,
        "frames": args.frames,
        "common_poses": n_common,
        "runs": {d: {"keyframes": r["keyframes"], "wall_s": r["wall_s"]}
                 for d, r in runs.items()},
        "checks": checks,
        "note": "wall_s on tpu is tunnel host-pull latency, not on-chip "
                "throughput; see bench.py / FULLSYS_TPU.json for measured Hz",
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{'E2E PARITY OK' if ok else 'E2E PARITY FAIL'} -> {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

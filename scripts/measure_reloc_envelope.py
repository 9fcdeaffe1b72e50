#!/usr/bin/env python
"""Measure the relocalization viewpoint envelope on the 80-keyframe loop map.

Builds the 160-frame loop dataset once, runs VO + refinement once, then
renders hard-query sets at increasing viewpoint gaps (lateral offset / yaw)
and runs the relocalization CLI against each — printing recall per point.

Round-2 baseline (400-kpt map, no projection recovery): 10/10 @ 0.45 m/12°,
6/10 @ 0.70 m/18°, 0/10 @ 1.0 m/25°. Round-3 levers: projection-guided match
recovery after PnP (pipelines/map_user.py) and an optional higher map-side
keypoint budget (--map_kpts).

Round-4 measured attribution of the OUTER envelope (this script, --oracle:
perfect-recall retrieval AND every group attempted, no top-3 cap):
  1.0 m/25°: BoW 10/10, oracle 10/10
  1.5 m/35°: BoW 0/10,  oracle 1/10
  2.0 m/45°: BoW 0/10,  oracle 0/10
=> past 1.0 m/25° the ceiling is MATCHING/WORLD COVERAGE (mostly-unmapped
views), not retrieval — perfect retrieval recovers at most one more query.

Usage:
  python scripts/measure_reloc_envelope.py --work /tmp/envelope [--map_kpts 800]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the container pins JAX to the remote-TPU tunnel; the in-process rendering
# (render_hard_queries) must run on local CPU or every dispatch crosses the
# network
jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

POINTS = [(0.45, 12.0), (0.70, 18.0), (1.00, 25.0), (1.50, 35.0), (2.00, 45.0)]


def run(cmd):
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)}\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return r.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--queries", type=int, default=10)
    ap.add_argument("--map_kpts", type=int, default=0,
                    help="override the map-side max_keypoints (0 = config)")
    ap.add_argument("--no_recovery", action="store_true",
                    help="disable projection-guided recovery (baseline)")
    ap.add_argument("--oracle", action="store_true",
                    help="ALSO run each point with perfect-recall retrieval "
                         "(every keyframe a candidate) — the recall gap "
                         "BoW-vs-oracle attributes failures to retrieval, "
                         "oracle-vs-10/10 to matching/world coverage")
    ap.add_argument("--points", default=None,
                    help="comma-separated off:yaw pairs overriding the sweep "
                         "(e.g. '1.5:35,2.0:45')")
    args = ap.parse_args()

    global POINTS
    if args.points:
        POINTS = [tuple(float(v) for v in p.split(":"))
                  for p in args.points.split(",")]

    os.makedirs(args.work, exist_ok=True)
    dsroot = os.path.join(args.work, "ds")
    mav0 = os.path.join(dsroot, "SYNTH_01", "mav0")
    vo_out = os.path.join(args.work, "out")

    if not os.path.exists(os.path.join(mav0, "cam0", "data")):
        print("rendering dataset ...", flush=True)
        run(["apps/make_synth_dataset.py", "--out", dsroot,
             "--frames", str(args.frames), "--stride", "2", "--traj", "loop"])

    vo_cfg = "configs/visual_odometry/vo_euroc.yaml"
    if args.map_kpts:
        import yaml

        with open(os.path.join(REPO, vo_cfg)) as f:
            node = yaml.safe_load(f)
        node["plnet"]["max_keypoints"] = int(args.map_kpts)
        vo_cfg_abs = os.path.join(args.work, f"vo_{args.map_kpts}.yaml")
        with open(vo_cfg_abs, "w") as f:
            yaml.safe_dump(node, f)
        vo_cfg = vo_cfg_abs

    if not os.path.exists(os.path.join(vo_out, "AirSLAM_mapv1.bin")):
        os.makedirs(vo_out, exist_ok=True)
        print("running visual_odometry ...", flush=True)
        run(["apps/visual_odometry.py", "--config_path", vo_cfg,
             "--camera_config_path", "configs/camera/synth_stereo.yaml",
             "--dataroot", mav0, "--saving_dir", vo_out, "--device", "cpu"])
        print("running map_refinement ...", flush=True)
        run(["apps/map_refinement.py",
             "--config_path", "configs/map_refinement/mr_euroc.yaml",
             "--map_root", vo_out, "--device", "cpu"])

    # render + evaluate each envelope point
    from apps.make_synth_dataset import render_hard_queries
    from apps.benchmark_system import traj_position

    ts = np.arange(args.frames) * 0.05 * 2
    total = float(args.frames * 0.05 * 2)
    gt = []
    for k in range(args.frames):
        T = np.eye(4)
        T[:3, 3] = traj_position(ts[k], "loop", total)
        gt.append(T)

    results = {}
    for off, yaw in POINTS:
        sub = f"hard_{int(off * 100)}_{int(yaw)}"
        if not os.path.exists(os.path.join(mav0, sub, "data")):
            render_hard_queries(mav0, 0, ts, gt, args.queries, 480, 752,
                                offset=off, yaw_deg=yaw, subdir=sub)
        traj = os.path.join(vo_out, f"reloc_{sub}.txt")
        cmd = ["apps/relocalization.py",
               "--config_path", "configs/relocalization/reloc_euroc.yaml",
               "--map_root", vo_out,
               "--query_folder", os.path.join(mav0, sub, "data"),
               "--traj_path", traj, "--device", "cpu"]
        if args.no_recovery:
            cmd.append("--no_recovery")
        out = run(cmd)
        line = [l for l in out.splitlines() if l.startswith("recall:")][-1]
        if args.oracle:
            out_o = run(cmd + ["--oracle_retrieval", "--traj_path",
                               os.path.join(vo_out, f"reloc_{sub}_oracle.txt")])
            oline = [l for l in out_o.splitlines()
                     if l.startswith("recall:")][-1]
            line = f"{line}   [oracle retrieval: {oline}]"
        results[(off, yaw)] = line
        print(f"{off:.2f} m / {yaw:.0f} deg -> {line}", flush=True)

    print("\nenvelope:")
    for (off, yaw), line in results.items():
        print(f"  {off:.2f} m / {yaw:.0f} deg : {line}")


if __name__ == "__main__":
    main()

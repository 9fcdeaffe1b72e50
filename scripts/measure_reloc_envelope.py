#!/usr/bin/env python
"""Measure the relocalization viewpoint envelope — and attribute it CAUSALLY.

Builds a map per coverage level (--trajs), renders hard-query sets at
increasing viewpoint gaps (lateral offset / yaw) and runs the relocalization
CLI against each map — printing recall per (map, point). The QUERY POSES ARE
IDENTICAL ACROSS MAPS (always rendered as offsets from the nominal *loop*
trajectory over the same world), so any recall difference between maps is
caused by what the map covers, not by the queries.

Round-2 baseline (400-kpt map, no projection recovery): 10/10 @ 0.45 m/12°,
6/10 @ 0.70 m/18°, 0/10 @ 1.0 m/25°. Round-3 levers: projection-guided match
recovery after PnP (pipelines/map_user.py) and an optional higher map-side
keypoint budget (--map_kpts).

Round-4 measured attribution of the OUTER envelope (--oracle: perfect-recall
retrieval AND every group attempted, no top-3 cap):
  1.0 m/25°: BoW 10/10, oracle 10/10
  1.5 m/35°: BoW 0/10,  oracle 1/10
  2.0 m/45°: BoW 0/10,  oracle 0/10
=> past 1.0 m/25° the ceiling is MATCHING/WORLD COVERAGE (mostly-unmapped
views), not retrieval — perfect retrieval recovers at most one more query.

Round-5 makes that attribution causal (verdict item 8): ``--trajs loop,wide``
builds a second map over the SAME world whose trajectory sweeps the ±1.5 m
lateral band the hard queries occupy (apps/benchmark_system.py::traj_position
"wide"). If world coverage is the binding constraint, the wide map's envelope
must extend exactly where its coverage extends; results land in
ENVELOPE.json.

Usage:
  python scripts/measure_reloc_envelope.py --work /tmp/envelope \
      [--trajs loop,wide] [--map_kpts 800] [--oracle]
"""

from __future__ import annotations

import argparse
import json
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

# frames per trajectory: "wide" traverses ~2x the path length (two z loops +
# the lateral sweep), so it gets 2x the frames at the same 10 Hz — identical
# per-frame motion, twice the coverage.
TRAJ_FRAMES = {"loop": 160, "wide": 320}


def run(cmd, timeout=7200):
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, capture_output=True,
                       text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)}\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return r.stdout


def build_map(work, traj, frames, map_kpts):
    """Render the <traj> dataset and run VO + refinement once (cached)."""
    dsroot = os.path.join(work, traj, "ds")
    mav0 = os.path.join(dsroot, "SYNTH_01", "mav0")
    vo_out = os.path.join(work, traj, "out")

    if not os.path.exists(os.path.join(mav0, "cam0", "data")):
        print(f"[{traj}] rendering dataset ({frames} frames) ...", flush=True)
        run(["apps/make_synth_dataset.py", "--out", dsroot,
             "--frames", str(frames), "--stride", "2", "--traj", traj])

    vo_cfg = "configs/visual_odometry/vo_euroc.yaml"
    if map_kpts:
        import yaml

        with open(os.path.join(REPO, vo_cfg)) as f:
            node = yaml.safe_load(f)
        node["plnet"]["max_keypoints"] = int(map_kpts)
        vo_cfg_abs = os.path.join(work, traj, f"vo_{map_kpts}.yaml")
        with open(vo_cfg_abs, "w") as f:
            yaml.safe_dump(node, f)
        vo_cfg = vo_cfg_abs

    if not os.path.exists(os.path.join(vo_out, "AirSLAM_mapv1.bin")):
        os.makedirs(vo_out, exist_ok=True)
        print(f"[{traj}] running visual_odometry ...", flush=True)
        run(["apps/visual_odometry.py", "--config_path", vo_cfg,
             "--camera_config_path", "configs/camera/synth_stereo.yaml",
             "--dataroot", mav0, "--saving_dir", vo_out, "--device", "cpu"])
        print(f"[{traj}] running map_refinement ...", flush=True)
        run(["apps/map_refinement.py",
             "--config_path", "configs/map_refinement/mr_euroc.yaml",
             "--map_root", vo_out, "--device", "cpu"])
    return mav0, vo_out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--trajs", default="loop",
                    help="comma list of map trajectories to build/evaluate "
                         "(loop,wide) — queries are IDENTICAL across maps")
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
    ap.add_argument("--json_out", default=None,
                    help="write the (map, point) -> recall table as JSON")
    args = ap.parse_args()

    global POINTS
    if args.points:
        POINTS = [tuple(float(v) for v in p.split(":"))
                  for p in args.points.split(",")]
    trajs = args.trajs.split(",")

    os.makedirs(args.work, exist_ok=True)

    # Query poses: ALWAYS offsets from the nominal 160-frame loop trajectory
    # (the round-2..4 envelope definition) so every map faces the same set.
    from apps.make_synth_dataset import render_hard_queries
    from apps.benchmark_system import traj_position

    q_frames = TRAJ_FRAMES["loop"]
    ts = np.arange(q_frames) * 0.05 * 2
    total = float(q_frames * 0.05 * 2)
    gt = []
    for k in range(q_frames):
        T = np.eye(4)
        T[:3, 3] = traj_position(ts[k], "loop", total)
        gt.append(T)

    results = {}
    for traj in trajs:
        mav0, vo_out = build_map(args.work, traj,
                                 TRAJ_FRAMES.get(traj, 160), args.map_kpts)
        for off, yaw in POINTS:
            sub = f"hard_{int(off * 100)}_{int(yaw)}"
            if not os.path.exists(os.path.join(mav0, sub, "data")):
                render_hard_queries(mav0, 0, ts, gt, args.queries, 480, 752,
                                    offset=off, yaw_deg=yaw, subdir=sub)
            traj_out = os.path.join(vo_out, f"reloc_{sub}.txt")
            cmd = ["apps/relocalization.py",
                   "--config_path", "configs/relocalization/reloc_euroc.yaml",
                   "--map_root", vo_out,
                   "--query_folder", os.path.join(mav0, sub, "data"),
                   "--traj_path", traj_out, "--device", "cpu"]
            if args.no_recovery:
                cmd.append("--no_recovery")
            out = run(cmd)
            line = [l for l in out.splitlines() if l.startswith("recall:")][-1]
            if args.oracle:
                out_o = run(cmd + ["--oracle_retrieval", "--traj_path",
                                   os.path.join(vo_out,
                                                f"reloc_{sub}_oracle.txt")])
                oline = [l for l in out_o.splitlines()
                         if l.startswith("recall:")][-1]
                line = f"{line}   [oracle retrieval: {oline}]"
            results[(traj, off, yaw)] = line
            print(f"[{traj}] {off:.2f} m / {yaw:.0f} deg -> {line}",
                  flush=True)

    print("\nenvelope (identical queries; rows = map coverage):")
    for (traj, off, yaw), line in results.items():
        print(f"  [{traj:5}] {off:.2f} m / {yaw:.0f} deg : {line}")

    if args.json_out:
        blob = {f"{traj}|{off}|{yaw}": line
                for (traj, off, yaw), line in results.items()}
        with open(args.json_out, "w") as f:
            json.dump({"points": blob, "queries": args.queries,
                       "note": "query poses identical across maps (loop-"
                               "trajectory offsets); wide map covers the "
                               "±1.5 m lateral band"}, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()

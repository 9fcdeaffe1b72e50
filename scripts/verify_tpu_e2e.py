"""End-to-end SLAM on the real TPU — ALL THREE STAGES — gated against the
same runs on CPU.

The reference runs its whole system on the target device: mapping, map
refinement and relocalization all drive the same GPU engines
(/root/reference/demo/visual_odometry.cpp, src/map_refiner.cc:27-32,
src/map_user.cc:29-37). scripts/verify_tpu.py gates the individual compiled
programs against CPU oracles; THIS script runs the actual CLI apps — the
same binaries the e2e tests certify on CPU (tests/test_e2e_cli.py) — on
both devices over an identical synthetic loop sequence and gates:

stage 1 (apps/visual_odometry.py, cpu vs tpu):
  - cross-device trajectory agreement (unaligned ATE; both runs share the
    canonical init pose),
  - each device's Sim(3)-aligned ATE vs rendered ground truth,
  - keyframe-policy agreement (the decision chain consumes detector scores,
    match counts and PnP inliers — a device-numerics bug flips it).
stage 2 (apps/map_refinement.py, cpu vs tpu over the SAME mapv0 + the SAME
         trained point vocabulary, isolating refiner device numerics):
  - loop-pair count agreement (BoW gates + LightGlue matching + relative
    pose estimation all feed the count),
  - merged mappoint/mapline count agreement,
  - refined (trajectory_v1) ATE vs ground truth on both devices,
  - cross-device refined-trajectory agreement.
stage 3 (apps/relocalization.py, cpu vs tpu against the SAME refined map,
         novel-view hard queries with known ground truth):
  - recall on both devices (PLNet detect -> BoW + junction re-rank ->
    LightGlue -> PnP -> pose refinement, all compiled on the device),
  - accepted-pose ATE vs the novel-view ground truth on both devices.

Writes E2E_TPU.json with per-run wall_s and run metadata (fresh runs only —
``--reuse`` re-gates saved outputs and marks the artifact as reused).
Throughput through the tunnel is NOT the point here (per-frame host pulls
cost seconds; the measured on-chip rate lives in bench.py /
FULLSYS_TPU.json) — this artifact proves the production pipelines compute
the same maps and poses on the TPU that they compute on the certified CPU
path.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _run(cmd, timeout=10800):
    t0 = time.time()
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, capture_output=True,
                       text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(
            f"{' '.join(cmd)}\n--- stdout\n{r.stdout[-3000:]}"
            f"\n--- stderr\n{r.stderr[-3000:]}")
    return r.stdout, time.time() - t0


def _parse_line(stdout, prefix, what):
    """Last stdout line starting with ``prefix``; hard error when absent so a
    changed CLI format can never propagate None into the artifact."""
    lines = [l for l in stdout.splitlines() if l.startswith(prefix)]
    if not lines:
        raise RuntimeError(
            f"could not parse {what}: no line starting with {prefix!r} in "
            f"CLI output (format changed?)\n--- last stdout\n{stdout[-2000:]}")
    return lines[-1]


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


def _ate_vs_rows(traj_path, gt_rows):
    """Sim(3)-aligned ATE RMSE vs ground-truth rows (evo_ape -as semantics,
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
                    help="frames for the stage-1 cross-device VO runs (the "
                    "TPU run costs seconds/frame in tunnel host pulls)")
    ap.add_argument("--stages", default="1,2,3",
                    help="comma list of stages to (re)run")
    ap.add_argument("--workdir", default="/tmp/airslam_e2e_tpu")
    ap.add_argument("--reuse", action="store_true",
                    help="re-evaluate gates on already-saved outputs "
                    "(marked in the artifact)")
    ap.add_argument("--out", default=os.path.join(REPO, "E2E_TPU.json"))
    args = ap.parse_args()
    stages = set(int(s) for s in args.stages.split(","))

    os.makedirs(args.workdir, exist_ok=True)
    dataroot = os.path.join(args.workdir, "ds", "SYNTH_01", "mav0")
    # stage 3 needs the novel-view queries; re-render if an older workdir
    # only has the mapped views
    if not os.path.exists(os.path.join(dataroot, "hard0", "data")):
        shutil.rmtree(os.path.join(args.workdir, "ds"), ignore_errors=True)
        print("rendering dataset ...")
        _run(["apps/make_synth_dataset.py", "--out",
              os.path.join(args.workdir, "ds"), "--frames", "40",
              "--stride", "2", "--traj", "loop", "--hard_queries", "10"])

    gt = _load_gt(dataroot)
    checks = []

    def check(name, value, gate, op="<="):
        ok = (value <= gate) if op == "<=" else (value >= gate)
        checks.append({"name": name, "value": round(float(value), 5),
                       "gate": gate, "op": op, "pass": bool(ok)})
        print(f"{'OK ' if ok else 'FAIL'} {name}: {value:.5f} ({op} {gate})",
              flush=True)

    artifact_runs = {}

    # ------------------------------------------------------------------
    # stage 1: visual odometry, cpu vs tpu
    # ------------------------------------------------------------------
    vo = ["apps/visual_odometry.py",
          "--config_path", "configs/visual_odometry/vo_euroc.yaml",
          "--camera_config_path", "configs/camera/synth_stereo.yaml",
          "--dataroot", dataroot,
          "--max_frames", str(args.frames)]

    if 1 in stages:
        runs = {}
        for dev in ("cpu", "tpu"):
            out_dir = os.path.join(args.workdir, f"out_{dev}")
            traj = os.path.join(out_dir, "trajectory_v0.txt")
            meta_path = os.path.join(out_dir, "vo_meta.json")
            if args.reuse and os.path.exists(traj) and os.path.exists(
                    meta_path):
                runs[dev] = json.load(open(meta_path))
                runs[dev]["reused"] = True  # wall_s stays the recorded one
                runs[dev]["traj"] = traj
                print(f"reusing {dev} VO run: {runs[dev]['keyframes']} "
                      f"keyframes")
                continue
            print(f"[stage 1] visual_odometry on {dev} "
                  f"({args.frames} frames) ...", flush=True)
            stdout, dt = _run(vo + ["--saving_dir", out_dir,
                                    "--device", dev])
            line = _parse_line(stdout, "keyframe rate:",
                               f"{dev} keyframe count")
            kf = int(line.split(":")[1].split("/")[0])
            runs[dev] = {"keyframes": kf, "wall_s": round(dt, 1)}
            with open(meta_path, "w") as f:
                json.dump(runs[dev], f)
            runs[dev]["traj"] = traj
            print(f"  {dev}: {kf} keyframes, {dt:.0f}s wall")

        ate_cross, n_common = _ate_between(runs["tpu"]["traj"],
                                           runs["cpu"]["traj"])
        ate_cpu, _ = _ate_vs_rows(runs["cpu"]["traj"], gt)
        ate_tpu, _ = _ate_vs_rows(runs["tpu"]["traj"], gt)

        # Cross-device gate: the bf16 frontend perturbs keypoints ~0.1 px vs
        # the f32 CPU run, and those sub-pixel differences compound
        # CHAOTICALLY through RANSAC inlier sets, chi² gates and keyframe
        # thresholds over 20 tracked frames — two correct runs cannot agree
        # to machine epsilon. A real device-numerics bug manifests as blown
        # tracking (the vs-GT gates below, both tighter than the 0.10 m the
        # CPU e2e suite uses), flipped keyframe decisions, or
        # many-centimeter divergence.
        check("vo_ate_tpu_vs_cpu_m", ate_cross, 0.05)
        check("vo_ate_cpu_vs_gt_m", ate_cpu, 0.05)
        check("vo_ate_tpu_vs_gt_m", ate_tpu, 0.05)
        check("vo_keyframe_count_delta",
              abs(runs["tpu"]["keyframes"] - runs["cpu"]["keyframes"]), 1)
        artifact_runs["stage1_vo"] = {
            d: {k: v for k, v in r.items() if k != "traj"}
            for d, r in runs.items()}
        artifact_runs["stage1_vo"]["common_poses"] = n_common

    # ------------------------------------------------------------------
    # full-sequence CPU mapping run: the shared mapv0 both refiners consume
    # (isolates stage-2 device numerics from stage-1 divergence)
    # ------------------------------------------------------------------
    map_root = os.path.join(args.workdir, "map_full_cpu")
    if (2 in stages or 3 in stages) and not os.path.exists(
            os.path.join(map_root, "AirSLAM_mapv0.bin")):
        print("[prep] full-sequence visual_odometry on cpu ...", flush=True)
        stdout, dt = _run(
            ["apps/visual_odometry.py",
             "--config_path", "configs/visual_odometry/vo_euroc.yaml",
             "--camera_config_path", "configs/camera/synth_stereo.yaml",
             "--dataroot", dataroot, "--saving_dir", map_root,
             "--device", "cpu"])
        print(f"  mapping done in {dt:.0f}s")

    # ------------------------------------------------------------------
    # stage 2: map refinement, cpu vs tpu over the same mapv0 + vocabulary
    # ------------------------------------------------------------------
    if 2 in stages:
        voc_path = os.path.join(args.workdir, "point_voc_shared.npz")
        refs = {}
        for dev in ("cpu", "tpu"):
            rdir = os.path.join(args.workdir, f"refine_{dev}")
            meta_path = os.path.join(rdir, "refine_meta.json")
            if args.reuse and os.path.exists(meta_path):
                refs[dev] = json.load(open(meta_path))
                refs[dev]["reused"] = True  # wall_s stays the recorded one
                print(f"reusing {dev} refinement run: {refs[dev]}")
                continue
            shutil.rmtree(rdir, ignore_errors=True)
            os.makedirs(rdir)
            shutil.copy(os.path.join(map_root, "AirSLAM_mapv0.bin"), rdir)
            print(f"[stage 2] map_refinement on {dev} ...", flush=True)
            stdout, dt = _run(
                ["apps/map_refinement.py",
                 "--config_path", "configs/map_refinement/mr_euroc.yaml",
                 "--map_root", rdir, "--voc_path", voc_path,
                 "--device", dev])
            loops = int(_parse_line(stdout, "loop pairs:",
                                    f"{dev} loop pairs").split(":")[1])
            mline = _parse_line(stdout, "merged mappoints:",
                                f"{dev} merge counts")
            merged_pts = int(mline.split(":")[1].split()[0])
            merged_lns = int(mline.split("maplines:")[1])
            refs[dev] = {"loop_pairs": loops, "merged_mappoints": merged_pts,
                         "merged_maplines": merged_lns,
                         "wall_s": round(dt, 1)}
            with open(meta_path, "w") as f:
                json.dump(refs[dev], f)
            print(f"  {dev}: {refs[dev]}")

        ate_v1_cpu, _ = _ate_vs_rows(
            os.path.join(args.workdir, "refine_cpu", "trajectory_v1.txt"), gt)
        ate_v1_tpu, _ = _ate_vs_rows(
            os.path.join(args.workdir, "refine_tpu", "trajectory_v1.txt"), gt)
        ate_v1_cross, _ = _ate_between(
            os.path.join(args.workdir, "refine_tpu", "trajectory_v1.txt"),
            os.path.join(args.workdir, "refine_cpu", "trajectory_v1.txt"))
        ate_v1_cross_aligned, _ = _ate_vs_rows(
            os.path.join(args.workdir, "refine_tpu", "trajectory_v1.txt"),
            [(t, T) for t, T in __import__(
                "airslam_tpu.io.trajectory", fromlist=["load_tum"]).load_tum(
                os.path.join(args.workdir, "refine_cpu",
                             "trajectory_v1.txt"))])

        check("refine_loop_pairs_cpu", refs["cpu"]["loop_pairs"], 1, op=">=")
        check("refine_loop_pairs_delta",
              abs(refs["tpu"]["loop_pairs"] - refs["cpu"]["loop_pairs"]), 0)
        check("refine_merged_mappoints_cpu",
              refs["cpu"]["merged_mappoints"], 1, op=">=")
        # merging consumes matcher outputs; bf16 match-score jitter may move
        # a couple of landmark pairs across the merge gates
        delta_pts = abs(refs["tpu"]["merged_mappoints"]
                        - refs["cpu"]["merged_mappoints"])
        check("refine_merged_mappoints_rel_delta",
              delta_pts / max(refs["cpu"]["merged_mappoints"], 1), 0.1)
        check("refine_ate_cpu_vs_gt_m", ate_v1_cpu, 0.05)
        check("refine_ate_tpu_vs_gt_m", ate_v1_tpu, 0.05)
        # Cross-device: the refiner re-matches loop pairs on the device (bf16
        # on TPU vs f32 on CPU), so a couple of the ~500 landmark merges land
        # differently and global BA settles in a slightly different gauge —
        # the UNALIGNED difference conflates that gauge motion with numerics
        # (measured 5.4 cm here while both runs are ≤2.4 cm vs GT aligned).
        # Gate shape agreement (aligned, tight) + unaligned at the 0.10 m
        # bound the CPU e2e suite uses for absolute accuracy.
        check("refine_ate_tpu_vs_cpu_aligned_m", ate_v1_cross_aligned, 0.05)
        check("refine_ate_tpu_vs_cpu_unaligned_m", ate_v1_cross, 0.10)
        artifact_runs["stage2_refine"] = refs

    # ------------------------------------------------------------------
    # stage 3: relocalization, cpu vs tpu against the same refined map
    # ------------------------------------------------------------------
    if 3 in stages:
        reloc_map = os.path.join(args.workdir, "refine_cpu")
        if not os.path.exists(os.path.join(reloc_map, "AirSLAM_mapv1.bin")):
            raise SystemExit("stage 3 needs stage 2's refine_cpu output")
        # stage 2 wrote the (shared) point vocabulary to --voc_path, not into
        # the map root where the reloc CLI expects it
        voc_dst = os.path.join(reloc_map, "point_voc.npz")
        if not os.path.exists(voc_dst):
            shutil.copy(os.path.join(args.workdir, "point_voc_shared.npz"),
                        voc_dst)
        hard_gt = [(t, T) for t, T in __import__(
            "airslam_tpu.io.trajectory", fromlist=["load_tum"]).load_tum(
                os.path.join(dataroot, "hard0", "gt_tum.txt"))]
        relocs = {}
        for dev in ("cpu", "tpu"):
            traj = os.path.join(args.workdir, f"reloc_{dev}.txt")
            meta_path = os.path.join(args.workdir, f"reloc_{dev}_meta.json")
            if args.reuse and os.path.exists(meta_path):
                relocs[dev] = json.load(open(meta_path))
                relocs[dev]["reused"] = True  # wall_s stays the recorded one
                print(f"reusing {dev} reloc run: {relocs[dev]}")
                continue
            print(f"[stage 3] relocalization on {dev} (10 novel-view "
                  f"queries) ...", flush=True)
            stdout, dt = _run(
                ["apps/relocalization.py",
                 "--config_path", "configs/relocalization/reloc_euroc.yaml",
                 "--map_root", reloc_map,
                 "--query_folder", os.path.join(dataroot, "hard0", "data"),
                 "--traj_path", traj, "--device", dev])
            line = _parse_line(stdout, "recall:", f"{dev} recall")
            success, total = line.split(":")[1].split("=")[0].split("/")
            relocs[dev] = {"success": int(success), "total": int(total),
                           "wall_s": round(dt, 1)}
            with open(meta_path, "w") as f:
                json.dump(relocs[dev], f)
            print(f"  {dev}: {line.strip()}, {dt:.0f}s wall")

        ate_h_cpu, n_cpu = _ate_vs_rows(
            os.path.join(args.workdir, "reloc_cpu.txt"), hard_gt)
        ate_h_tpu, n_tpu = _ate_vs_rows(
            os.path.join(args.workdir, "reloc_tpu.txt"), hard_gt)
        check("reloc_recall_cpu",
              relocs["cpu"]["success"] / max(relocs["cpu"]["total"], 1),
              0.8, op=">=")
        check("reloc_recall_tpu",
              relocs["tpu"]["success"] / max(relocs["tpu"]["total"], 1),
              0.8, op=">=")
        check("reloc_ate_cpu_vs_gt_m", ate_h_cpu, 0.05)
        check("reloc_ate_tpu_vs_gt_m", ate_h_tpu, 0.05)
        artifact_runs["stage3_reloc"] = relocs

    ok = all(c["pass"] for c in checks)
    artifact = {
        "ok": ok,
        "generated_utc": datetime.datetime.utcnow().isoformat(
            timespec="seconds") + "Z",
        "reused": bool(args.reuse),
        "stages": sorted(stages),
        "stage1_frames": args.frames,
        "runs": artifact_runs,
        "checks": checks,
        "note": "wall_s on tpu is dominated by tunnel host-pull latency, "
                "not on-chip throughput; see bench.py / FULLSYS_TPU.json "
                "for measured Hz",
    }
    # merge with an existing artifact so partial --stages reruns keep the
    # other stages' results (their checks are re-listed only when rerun)
    if os.path.exists(args.out) and stages != {1, 2, 3}:
        old = json.load(open(args.out))
        for k, v in old.get("runs", {}).items():
            artifact["runs"].setdefault(k, v)
        names = {c["name"] for c in checks}
        # every check is stage-prefixed; a re-run stage replaces ALL its old
        # checks (renamed/removed gates must not linger in the artifact)
        rerun_prefixes = tuple(
            {1: "vo_", 2: "refine_", 3: "reloc_"}[s] for s in stages)
        for c in old.get("checks", []):
            if c["name"] not in names and not c["name"].startswith(
                    rerun_prefixes):
                artifact["checks"].append(c)
        artifact["ok"] = all(c["pass"] for c in artifact["checks"])
        artifact["stages"] = sorted(set(old.get("stages", [])) | stages)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{'E2E PARITY OK' if artifact['ok'] else 'E2E PARITY FAIL'} "
          f"-> {args.out}")
    sys.exit(0 if artifact["ok"] else 1)


if __name__ == "__main__":
    main()

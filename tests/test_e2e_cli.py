"""End-to-end CLI integration over an on-disk ASL/EuRoC-format dataset.

The reference's user workflow (SURVEY §3): generate a sequence directory
(apps/make_synth_dataset.py — EuRoC itself is not in the image), then run the
actual CLI apps as subprocesses:

  visual_odometry.py  →  trajectory_v0.txt + AirSLAM_mapv0.bin
  map_refinement.py   →  trajectory_v1.txt + AirSLAM_mapv1.bin

with ATE computed against the emitted ground truth (the evo_ape-style
harness, reference scripts/evaluation.py:96-99). Exercises the real CNN
checkpoints, YAML configs, dataset walking, serialization and the refinement
pipeline through their public entry points."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "airslam_tpu", "checkpoints", "plnet_s0.npz")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(CKPT), reason="trained checkpoints absent"),
]

N_FRAMES = 40  # stride-2 loop trajectory → 4 s span (VI init needs ≥ 3 s),
# out-and-back so map_refinement has a genuine loop to close


def _run(cmd):
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, capture_output=True,
                       text=True, timeout=1800)
    assert r.returncode == 0, f"{' '.join(cmd)}\n--- stdout\n{r.stdout[-3000:]}\n--- stderr\n{r.stderr[-3000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthds")
    _run(["apps/make_synth_dataset.py", "--out", str(root),
          "--frames", str(N_FRAMES), "--stride", "2", "--traj", "loop",
          "--hard_queries", "10"])
    return os.path.join(str(root), "SYNTH_01", "mav0")


def _ate(traj_path, dataroot):
    """Sim(3)-aligned ATE RMSE, the reference's evo_ape -as semantics
    (estimates live in the canonical init-pose frame)."""
    from airslam_tpu.io.trajectory import ate_rmse, load_tum

    est = load_tum(traj_path)
    gt_rows = []
    with open(os.path.join(dataroot, "state_groundtruth_estimate0", "data.csv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            v = line.strip().split(",")
            T = np.eye(4)
            T[:3, 3] = [float(x) for x in v[1:4]]
            gt_rows.append((float(v[0]) * 1e-9, T))
    gt_times = np.asarray([t for t, _ in gt_rows])
    pairs_e, pairs_g = [], []
    for t, T in est:
        j = int(np.argmin(np.abs(gt_times - t)))
        if abs(gt_times[j] - t) < 0.02:
            pairs_e.append((t, T))
            pairs_g.append(gt_rows[j])
    assert len(pairs_e) >= 5
    return float(ate_rmse(pairs_e, pairs_g, align=True))


@pytest.fixture(scope="module")
def vo_out(dataset, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synthout"))
    _run(["apps/visual_odometry.py",
          "--config_path", "configs/visual_odometry/vo_euroc.yaml",
          "--camera_config_path", "configs/camera/synth_stereo.yaml",
          "--dataroot", dataset, "--saving_dir", out, "--device", "cpu"])
    return out


def test_vo_cli_trajectory_accuracy(dataset, vo_out):
    traj = os.path.join(vo_out, "trajectory_v0.txt")
    assert os.path.exists(traj)
    assert os.path.exists(os.path.join(vo_out, "AirSLAM_mapv0.bin"))
    ate = _ate(traj, dataset)
    # ~4.7 m trajectory rendered at 480×752; the in-memory benchmark achieves
    # sub-cm — allow for png quantization and the short window
    assert ate < 0.10, f"ATE {ate:.3f} m"


def test_refinement_cli_over_saved_map(dataset, vo_out):
    out = _run(["apps/map_refinement.py",
                "--config_path", "configs/map_refinement/mr_euroc.yaml",
                "--map_root", vo_out, "--device", "cpu"])
    traj1 = os.path.join(vo_out, "trajectory_v1.txt")
    assert os.path.exists(traj1)
    assert os.path.exists(os.path.join(vo_out, "AirSLAM_mapv1.bin"))
    # the out-and-back trajectory revisits its start — the BoW loop gates
    # (shared words, deputies, 3% distance) must fire on real CNN features
    loops = [l for l in out.splitlines() if l.startswith("loop pairs:")][-1]
    assert int(loops.split(":")[1]) >= 1, loops
    # revisiting the start duplicates landmarks — merging must consolidate
    # some (reference MergeMappoints/MergeMaplines, map_refiner.cc:593-954)
    merged = [l for l in out.splitlines() if l.startswith("merged mappoints:")][-1]
    assert int(merged.split(":")[1].split()[0]) >= 1, merged
    ate = _ate(traj1, dataset)
    assert ate < 0.05, f"refined ATE {ate:.3f} m"


def test_relocalization_cli(dataset, vo_out):
    """Third CLI stage: relocalize (a subsample of) the sequence images
    against the refined map — recall and pose accuracy
    (demo/relocalization.cpp:63 semantics). Depends on the refinement test
    having produced AirSLAM_mapv1.bin + vocabularies."""
    if not os.path.exists(os.path.join(vo_out, "AirSLAM_mapv1.bin")):
        _run(["apps/map_refinement.py",
              "--config_path", "configs/map_refinement/mr_euroc.yaml",
              "--map_root", vo_out, "--device", "cpu"])
    traj = os.path.join(vo_out, "reloc_trajectory.txt")
    out = _run(["apps/relocalization.py",
                "--config_path", "configs/relocalization/reloc_euroc.yaml",
                "--map_root", vo_out,
                "--query_folder", os.path.join(dataset, "cam0", "data"),
                "--traj_path", traj, "--query_stride", "4", "--device", "cpu"])
    line = [l for l in out.splitlines() if l.startswith("recall:")][-1]
    success, total = line.split(":")[1].split("=")[0].split("/")
    assert int(total) >= 8
    assert int(success) / int(total) >= 0.7, line
    ate = _ate(traj, dataset)
    assert ate < 0.10, f"reloc ATE {ate:.3f} m"


def test_relocalization_hard_queries(dataset, vo_out):
    """Novel-view queries rendered OFF the mapped trajectory (0.18-0.30 m
    lateral, 4-9° yaw, ±3° pitch — make_synth_dataset --hard_queries): the
    BoW retrieval + junction re-rank + LightGlue + PnP chain must still
    relocalize, and the poses must match the known novel-view ground truth
    (mav0/hard0/gt_tum.txt), not just the mapped keyframe poses."""
    if not os.path.exists(os.path.join(vo_out, "AirSLAM_mapv1.bin")):
        _run(["apps/map_refinement.py",
              "--config_path", "configs/map_refinement/mr_euroc.yaml",
              "--map_root", vo_out, "--device", "cpu"])
    traj = os.path.join(vo_out, "reloc_hard.txt")
    out = _run(["apps/relocalization.py",
                "--config_path", "configs/relocalization/reloc_euroc.yaml",
                "--map_root", vo_out,
                "--query_folder", os.path.join(dataset, "hard0", "data"),
                "--traj_path", traj, "--device", "cpu"])
    line = [l for l in out.splitlines() if l.startswith("recall:")][-1]
    success, total = line.split(":")[1].split("=")[0].split("/")
    assert int(total) == 10
    assert int(success) / int(total) >= 0.8, line

    from airslam_tpu.io.trajectory import ate_rmse, load_tum

    est = load_tum(traj)
    gt = load_tum(os.path.join(dataset, "hard0", "gt_tum.txt"))
    gt_times = np.asarray([t for t, _ in gt])
    pe, pg = [], []
    for t, T in est:
        j = int(np.argmin(np.abs(gt_times - t)))
        if abs(gt_times[j] - t) < 0.02:
            pe.append((t, T))
            pg.append(gt[j])
    assert len(pe) >= 8
    ate = float(ate_rmse(pe, pg, align=True))
    assert ate < 0.05, f"hard-query reloc ATE {ate:.3f} m"


def test_vi_vo_cli(dataset, tmp_path_factory):
    """Visual-INERTIAL CLI over the same sequence (imu0 csv + VI camera
    YAML): IMU initialization must fire, and the full-rate trajectory must
    stay consistent through the gravity re-alignment of the map."""
    out = str(tmp_path_factory.mktemp("synthout_vi"))
    _run(["apps/visual_odometry.py",
          "--config_path", "configs/visual_odometry/vo_euroc.yaml",
          "--camera_config_path", "configs/camera/synth_stereo_imu.yaml",
          "--dataroot", dataset, "--saving_dir", out, "--device", "cpu"])
    sys.path.insert(0, REPO)
    from airslam_tpu.io.serialization import load_map

    m, _ = load_map(os.path.join(out, "AirSLAM_mapv0.bin"))
    assert m.imu_initialized, "VI initialization did not fire"
    ate = _ate(os.path.join(out, "trajectory_v0.txt"), dataset)
    assert ate < 0.10, f"VI ATE {ate:.3f} m"

"""Illumination-robustness end-to-end gates — the system's headline claim
("illumination-robust point-line SLAM"; the reference ships a dedicated
dark-EuRoC pipeline: configs/visual_odometry/vo_euroc_dark.yaml,
launch/visual_odometry/vo_euroc_dark.launch, dark-EuRoC rows in
scripts/evaluation.py).

EuRoC/dark-EuRoC are not in the container; the stand-in is the same loop
sequence rendered (a) gamma-crushed + noisy low-light (--photometric dark,
~4x darker) and (b) with 1/f plane texture (natural-image statistics).
Gates: dark vision-only VO ATE within ~2x of the bright gate; dark
stereo-INERTIAL VO (the reference's dark pipeline is stereo-inertial —
vo_euroc_dark.launch runs with imu0) must IMU-initialize and hold the bright
ATE gate; refinement + relocalization run on the stereo-inertial map with
gates calibrated to this chain's measured headroom (constants below); and
the textured world tracks to the same ATE gate as the flat-shaded one.
"""

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

N_FRAMES = 40

# Measured on this chain (round 4, dark stereo-inertial map, query stride 4):
# recall 10/10 = 1.000, loop pairs 2, dark VIO ATE 0.011 m. Gates sit two
# queries / ~10x below the measurement so rng/machine variance can't flake
# them, but a real regression (e.g. the round-3 dark loop-closure bug) trips.
DARK_RELOC_GATE = 0.8
DARK_VIO_ATE_GATE = 0.10


def _run(cmd):
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, capture_output=True,
                       text=True, timeout=1800)
    assert r.returncode == 0, (f"{' '.join(cmd)}\n--- stdout\n{r.stdout[-3000:]}"
                               f"\n--- stderr\n{r.stderr[-3000:]}")
    return r.stdout


def _ate(traj_path, dataroot):
    from tests.test_e2e_cli import _ate as ate

    return ate(traj_path, dataroot)


@pytest.fixture(scope="module")
def dark_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("darkds")
    _run(["apps/make_synth_dataset.py", "--out", str(root),
          "--frames", str(N_FRAMES), "--stride", "2", "--traj", "loop",
          "--photometric", "dark"])
    return os.path.join(str(root), "SYNTH_01", "mav0")


@pytest.fixture(scope="module")
def textured_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("texds")
    _run(["apps/make_synth_dataset.py", "--out", str(root),
          "--frames", str(N_FRAMES), "--stride", "2", "--traj", "loop",
          "--texture", "0.12"])
    return os.path.join(str(root), "SYNTH_01", "mav0")


def test_dark_sequence_is_actually_dark(dark_dataset):
    import cv2

    files = sorted(os.listdir(os.path.join(dark_dataset, "cam0", "data")))
    img = cv2.imread(os.path.join(dark_dataset, "cam0", "data", files[0]),
                     cv2.IMREAD_GRAYSCALE)
    mean = img.mean() / 255.0
    assert mean < 0.18, f"dark render too bright: mean={mean:.3f}"


@pytest.fixture(scope="module")
def dark_vo_out(dark_dataset, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("darkout"))
    _run(["apps/visual_odometry.py",
          "--config_path", "configs/visual_odometry/vo_euroc_dark.yaml",
          "--camera_config_path", "configs/camera/synth_stereo.yaml",
          "--dataroot", dark_dataset, "--saving_dir", out, "--device", "cpu"])
    return out


def test_dark_vo_ate(dark_dataset, dark_vo_out):
    """Dark VO with the reference's dark config: ATE within ~2x of the
    bright gate (bright: 0.10 m, tests/test_e2e_cli.py)."""
    traj = os.path.join(dark_vo_out, "trajectory_v0.txt")
    assert os.path.exists(traj)
    ate = _ate(traj, dark_dataset)
    assert ate < 0.20, f"dark ATE {ate:.3f} m"


def test_dark_refinement_and_reloc(dark_dataset, dark_vio_out):
    """Loop closure + relocalization stay functional in the dark, on the
    stereo-INERTIAL map (the reference's dark pipeline is stereo-inertial:
    vo_euroc_dark.launch): the loop gate fires, and reloc recall holds the
    measured headroom (see gate note below)."""
    out = _run(["apps/map_refinement.py",
                "--config_path", "configs/map_refinement/mr_euroc.yaml",
                "--map_root", dark_vio_out, "--device", "cpu"])
    loops = [l for l in out.splitlines() if l.startswith("loop pairs:")][-1]
    assert int(loops.split(":")[1]) >= 1, loops

    traj = os.path.join(dark_vio_out, "reloc_trajectory.txt")
    out = _run(["apps/relocalization.py",
                "--config_path", "configs/relocalization/reloc_euroc.yaml",
                "--map_root", dark_vio_out,
                "--query_folder", os.path.join(dark_dataset, "cam0", "data"),
                "--traj_path", traj, "--query_stride", "4", "--device", "cpu"])
    line = [l for l in out.splitlines() if l.startswith("recall:")][-1]
    success, total = line.split(":")[1].split("=")[0].split("/")
    assert int(total) >= 8
    # calibrated gate: measured DARK_RELOC_RECALL on this chain (round 4);
    # gate at one query of headroom below the measurement
    assert int(success) / int(total) >= DARK_RELOC_GATE, line


@pytest.fixture(scope="module")
def dark_vio_out(dark_dataset, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("darkout_vi"))
    _run(["apps/visual_odometry.py",
          "--config_path", "configs/visual_odometry/vo_euroc_dark.yaml",
          "--camera_config_path", "configs/camera/synth_stereo_imu.yaml",
          "--dataroot", dark_dataset, "--saving_dir", out, "--device", "cpu"])
    return out


def test_dark_vio_ate(dark_dataset, dark_vio_out):
    """Dark VISUAL-INERTIAL run — darkness is precisely when the IMU matters
    (the reference's dark-EuRoC pipeline is stereo-inertial:
    launch/visual_odometry/vo_euroc_dark.launch). IMU initialization must
    fire on the low-light sequence and the trajectory must hold the same
    gate as the dark vision-only run."""
    sys.path.insert(0, REPO)
    from airslam_tpu.io.serialization import load_map

    m, _ = load_map(os.path.join(dark_vio_out, "AirSLAM_mapv0.bin"))
    assert m.imu_initialized, "VI initialization did not fire in the dark"
    ate = _ate(os.path.join(dark_vio_out, "trajectory_v0.txt"), dark_dataset)
    assert ate < DARK_VIO_ATE_GATE, f"dark VIO ATE {ate:.3f} m"


def test_textured_vo_ate(textured_dataset, tmp_path_factory):
    """The textured world (natural-image statistics, exact multi-view
    parallax) tracks to the SAME gate as the flat-shaded sequence."""
    out = str(tmp_path_factory.mktemp("texout"))
    _run(["apps/visual_odometry.py",
          "--config_path", "configs/visual_odometry/vo_euroc.yaml",
          "--camera_config_path", "configs/camera/synth_stereo.yaml",
          "--dataroot", textured_dataset, "--saving_dir", out, "--device", "cpu"])
    ate = _ate(os.path.join(out, "trajectory_v0.txt"), textured_dataset)
    assert ate < 0.10, f"textured ATE {ate:.3f} m"

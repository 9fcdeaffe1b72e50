import os

import numpy as np
import pytest

from airslam_tpu.io.config import (
    VisualOdometryConfigs, MapRefinementConfigs, RelocalizationConfigs,
)
from airslam_tpu.io.trajectory import save_tum, load_tum, ate_rmse

REF_CFG = "/root/reference/configs"


def test_vo_config_parses_reference_yaml():
    cfg = VisualOdometryConfigs.load(f"{REF_CFG}/visual_odometry/vo_euroc.yaml")
    assert cfg.detector.max_keypoints == 400
    assert cfg.detector.use_superpoint
    assert cfg.detector.keypoint_threshold == pytest.approx(0.004)
    assert cfg.matcher.matcher == 0
    assert cfg.keyframe.min_init_stereo_feature == 90
    assert cfg.keyframe.tracking_point_rate == pytest.approx(0.65)
    assert cfg.tracking_optimization.stereo_point == 75
    assert cfg.backend_optimization.line_sigma == pytest.approx(0.5)
    assert cfg.publisher.feature and cfg.publisher.feature_topic == "/AirSLAM/feature"


def test_mr_config_parses_reference_yaml():
    cfg = MapRefinementConfigs.load(f"{REF_CFG}/map_refinement/mr_euroc.yaml")
    assert cfg.matcher.matcher == 0
    assert cfg.backend_optimization.mono_point == 50
    assert not cfg.publisher.feature


def test_reloc_config_parses_reference_yaml():
    cfg = RelocalizationConfigs.load(f"{REF_CFG}/relocalization/reloc_euroc.yaml")
    assert cfg.min_inlier_num == 45
    assert cfg.pose_refinement
    assert not cfg.detector.use_superpoint
    assert cfg.detector.line_threshold == pytest.approx(0.8)
    assert cfg.tracking_optimization.stereo_line == 75


REPO_CFG = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_repo_configs_match_reference():
    """The repo ships its own configs/ tree (same schema+values) so the
    framework runs standalone; every file must parse identically to its
    reference counterpart."""
    import glob

    loaders = {
        "visual_odometry": VisualOdometryConfigs.load,
        "map_refinement": MapRefinementConfigs.load,
        "relocalization": RelocalizationConfigs.load,
    }
    checked = 0
    for sub, load in loaders.items():
        for repo_path in sorted(glob.glob(f"{REPO_CFG}/{sub}/*.yaml")):
            name = os.path.basename(repo_path)
            ref_path = f"{REF_CFG}/{sub}/{name}"
            ours = load(repo_path)
            if os.path.exists(ref_path):
                assert ours == load(ref_path), name
            checked += 1
    assert checked >= 10


def test_repo_camera_configs_match_reference():
    import glob

    from airslam_tpu.core.camera import Camera

    checked = 0
    for repo_path in sorted(glob.glob(f"{REPO_CFG}/camera/*.yaml")):
        name = os.path.basename(repo_path)
        ref_path = f"{REF_CFG}/camera/{name}"
        ours = Camera(repo_path)
        if os.path.exists(ref_path):
            ref = Camera(ref_path)
            assert ours.image_width == ref.image_width
            assert ours.use_imu == ref.use_imu
            assert (ours.fx, ours.fy, ours.cx, ours.cy) == (ref.fx, ref.fy, ref.cx, ref.cy)
            np.testing.assert_allclose(ours.Tbc, ref.Tbc, atol=1e-12)
            np.testing.assert_allclose(ours.bf, ref.bf, atol=1e-9)
        checked += 1
    assert checked >= 6


def test_tum_roundtrip(tmp_path):
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(0)
    traj = []
    for i in range(5):
        T = np.eye(4)
        T[:3, :3] = Rotation.random(random_state=rng).as_matrix()
        T[:3, 3] = rng.randn(3)
        traj.append((1403636579.8 + i * 0.05, T))
    p = os.path.join(tmp_path, "t.txt")
    save_tum(p, traj)
    loaded = load_tum(p)
    for (t0, T0), (t1, T1) in zip(traj, loaded):
        assert abs(t0 - t1) < 1e-6
        assert np.allclose(T0, T1, atol=1e-7)


def test_ate_alignment():
    rng = np.random.RandomState(1)
    from scipy.spatial.transform import Rotation

    gt = []
    for i in range(20):
        T = np.eye(4)
        T[:3, 3] = [i * 0.1, np.sin(i * 0.3), 0]
        gt.append((i * 0.1, T))
    # estimate = similarity-transformed ground truth → ATE after align ≈ 0
    R = Rotation.from_euler("z", 0.7).as_matrix()
    s = 1.3
    est = []
    for t, T in gt:
        T2 = np.eye(4)
        T2[:3, 3] = s * R @ T[:3, 3] + np.array([5, -2, 1])
        est.append((t, T2))
    assert ate_rmse(est, gt, align=True) < 1e-9
    assert ate_rmse(est, gt, align=False) > 1.0


def test_asl_dataset_loader(tmp_path):
    """ASL layout: cam0/data, cam1/data, imu0/data.csv (dataset.cc:8-64)."""
    import cv2
    from airslam_tpu.io.dataset import Dataset

    root = tmp_path / "mav0"
    for cam in ["cam0", "cam1"]:
        (root / cam / "data").mkdir(parents=True)
    (root / "imu0").mkdir(parents=True)

    t0 = 1403636579000000000
    rng = np.random.RandomState(0)
    for i in range(4):
        img = (rng.rand(48, 64) * 255).astype(np.uint8)
        for cam in ["cam0", "cam1"]:
            cv2.imwrite(str(root / cam / "data" / f"{t0 + i * 50_000_000}.png"), img)

    # IMU at 200 Hz covering frames 1..3 only (frame 0 outside IMU range)
    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        start = t0 + 30_000_000
        for k in range(60):
            ts = start + k * 5_000_000
            f.write(f"{ts},0.01,0.02,0.03,0.1,0.2,9.8\n")

    ds = Dataset(str(root), use_imu=True)
    # frame 0 dropped (before IMU range)
    assert len(ds) == 3
    ts, left, right, batch = ds.get(1)
    assert left.shape == (48, 64) and left.dtype == np.float32
    assert 0.0 <= left.min() and left.max() <= 1.0
    # the batch spans [previous frame, this frame]
    assert len(batch) > 5
    assert batch[0].timestamp <= ds.timestamps[0] + 0.01
    assert batch[-1].timestamp >= ds.timestamps[1] - 0.01

    ds2 = Dataset(str(root), use_imu=False)
    assert len(ds2) == 4

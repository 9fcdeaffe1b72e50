import numpy as np
import jax.numpy as jnp
import pytest

from airslam_tpu.core.camera import Camera, Intrinsics

EUROC_YAML = "/root/reference/configs/camera/euroc.yaml"


@pytest.fixture(scope="module")
def euroc_cam():
    return Camera(EUROC_YAML)


def test_parse_euroc(euroc_cam):
    cam = euroc_cam
    assert cam.image_width == 752 and cam.image_height == 480
    assert cam.use_imu
    assert cam.g_value == pytest.approx(9.81007)
    # rectified intrinsics produced by cv::stereoRectify are plausible
    assert 400 < cam.fx < 500
    assert abs(cam.bf / cam.fx - 0.11) < 0.02  # EuRoC baseline ~11 cm
    # IMU noise scaled by sqrt(200)
    assert cam.gyr_noise == pytest.approx(1.6968e-4 * np.sqrt(200.0))
    assert cam.acc_walk == pytest.approx(3.0e-3 / np.sqrt(200.0))
    assert cam.map_left is not None and cam.map_left.shape == (480, 752, 2)
    # Tbc parsed
    assert np.allclose(cam.Tbc @ cam.Tcb, np.eye(4), atol=1e-12)


def test_project_backproject_roundtrip(euroc_cam):
    intr = euroc_cam.intrinsics(jnp.float64)
    rng = np.random.RandomState(0)
    p3d = np.abs(rng.randn(100, 3)) + np.array([0, 0, 1.0])
    uv = intr.project(jnp.asarray(p3d))
    rays = intr.back_project_mono(uv)
    assert np.allclose(np.asarray(rays) * p3d[:, 2:3], p3d, atol=1e-9)


def test_stereo_project_backproject_roundtrip(euroc_cam):
    intr = euroc_cam.intrinsics(jnp.float64)
    rng = np.random.RandomState(1)
    p3d = rng.rand(50, 3) * np.array([2, 2, 8]) + np.array([-1, -1, 0.5])
    uvr = intr.stereo_project(jnp.asarray(p3d))
    back = intr.back_project_stereo(uvr)
    assert np.allclose(np.asarray(back), p3d, atol=1e-9)
    # disparity = bf / depth
    disp = np.asarray(uvr[:, 0] - uvr[:, 2])
    assert np.allclose(disp, float(intr.bf) / p3d[:, 2], atol=1e-9)


def test_undistorted_camera():
    node = {
        "image_height": 480,
        "image_width": 640,
        "depth_lower_thr": 0.1,
        "depth_upper_thr": 10.0,
        "max_y_diff": 1,
        "distortion_type": 0,
        "use_imu": 0,
        "cam0": {
            "intrinsics": [400.0, 400.0, 320.0, 240.0],
            "distortion_coeffs": [0, 0, 0, 0, 0],
            "T_type": 0,
            "T": np.eye(4).tolist(),
        },
        "cam1": {
            "intrinsics": [400.0, 400.0, 320.0, 240.0],
            "distortion_coeffs": [0, 0, 0, 0, 0],
            "T_type": 0,
            "T": [[1, 0, 0, -0.1], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        },
    }
    cam = Camera(node=node)
    assert cam.fx == 400.0
    assert cam.bf == pytest.approx(40.0)
    assert cam.map_left is None
    assert cam.max_x_diff == pytest.approx(400.0)


def test_rectification_against_opencv(euroc_cam):
    """Our XLA remap must agree with cv::remap INTER_LINEAR on the same maps."""
    import cv2
    from airslam_tpu.ops.gridsample import remap

    rng = np.random.RandomState(2)
    img = (rng.rand(480, 752) * 255).astype(np.float32)
    ref = cv2.remap(
        img, euroc_cam.map_left[..., 0], euroc_cam.map_left[..., 1], cv2.INTER_LINEAR
    )
    ml, _ = euroc_cam.rectify_maps()
    ours = np.asarray(remap(jnp.asarray(img), ml))
    # Interior pixels must match closely; borders may differ in OOB policy.
    mask = (
        (euroc_cam.map_left[..., 0] > 1)
        & (euroc_cam.map_left[..., 0] < 750)
        & (euroc_cam.map_left[..., 1] > 1)
        & (euroc_cam.map_left[..., 1] < 478)
    )
    diff = np.abs(ours - ref)[mask]
    assert diff.max() < 1e-2

"""Debug image writers (utils/debugviz.py ↔ src/debug.cc, debug.h:19-59) and
the frame-chain IMU validators (backend/validate.py ↔
g2o_optimization.cc:1158-1429)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from airslam_tpu.utils import debugviz


@pytest.fixture
def imgs():
    rng = np.random.RandomState(0)
    return rng.rand(480, 752).astype(np.float32), rng.rand(480, 752).astype(np.float32)


def _readable(path):
    assert os.path.exists(path)
    im = cv2.imread(path)
    assert im is not None and im.size > 0
    return im


def test_all_writers_produce_images(imgs, tmp_path):
    left, right = imgs
    kpts = np.asarray([[100.0, 120.0], [300.0, 200.0], [500.0, 400.0], [50.0, 60.0]])
    pairs = np.asarray([[0, 1], [2, 3]])
    lines = np.asarray([[50.0, 50.0, 400.0, 90.0], [100.0, 300.0, 600.0, 310.0]])
    relation = np.zeros((2, 4), bool)
    relation[0, 0] = relation[1, 2] = True

    p = tmp_path / "det.png"
    debugviz.save_detector_result(str(p), left, kpts)
    _readable(str(p))

    p = tmp_path / "lines.png"
    debugviz.save_line_detection_result(str(p), left, lines)
    _readable(str(p))

    p = tmp_path / "match.png"
    debugviz.save_matching_result(str(p), left, kpts, right, kpts, pairs)
    im = _readable(str(p))
    assert im.shape[1] == 752 * 2

    p = tmp_path / "stereo.png"
    debugviz.save_stereo_match_result(str(p), left, right, kpts,
                                      kpts + [0.0, 5.0], pairs)
    _readable(str(p))

    p = tmp_path / "plrel.png"
    debugviz.save_point_line_relation(str(p), left, lines, kpts, relation)
    _readable(str(p))

    p = tmp_path / "stereolines.png"
    debugviz.save_stereo_line_match(str(p), left, right, lines,
                                    lines + [5.0, 0, 5.0, 0], [1, -1],
                                    points_on_line_left=relation, kpts_left=kpts)
    _readable(str(p))

    p = tmp_path / "dbow.png"
    debugviz.save_dbow_matching_results(str(p), left, [right, left],
                                        scores=[0.8, 0.5], shared_words=[40, 22])
    _readable(str(p))

    p = tmp_path / "dbowj.png"
    mm = np.zeros((4, 4), bool)
    mm[0, 1] = mm[2, 2] = True
    debugviz.save_dbow_junction_matching(str(p), left, right, kpts, kpts, mm)
    _readable(str(p))


def test_imu_chain_validators():
    """The three frame-chain validators report near-zero residuals on a
    consistent synthetic VI chain and nonzero after a state perturbation."""
    from airslam_tpu.backend import validate
    from airslam_tpu.core.imu import ImuData, Preintegration
    from airslam_tpu.slam.frame import Frame
    from tests.synthetic import make_imu_sequence
    from tests.test_vio import _keyframe_preints

    G = 9.81
    seq = make_imu_sequence(duration=2.0)
    kf_idx, preints = _keyframe_preints(seq, 100, noise=(1e-9, 1e-9, 1e-12, 1e-12))
    Tcb = np.eye(4)

    class _F:
        def __init__(self, i, kf):
            self.frame_id = i
            Twb = np.eye(4)
            Twb[:3, :3] = seq["Rwb"][kf]
            Twb[:3, 3] = seq["pos"][kf]
            self._Twb = Twb
            self.velocity = seq["vel"][kf].copy()
            self.preintegration = None

        def imu_pose(self, Tcb):
            return self._Twb

    frames = [_F(i, kf) for i, kf in enumerate(kf_idx)]
    for i, p in enumerate(preints):
        frames[i + 1].preintegration = p

    g = validate.validate_gyr_bias(frames, Tcb)
    v = validate.validate_velocity(frames, Tcb, np.array([0.0, 0.0, -G]))
    ini = validate.validate_imu_initialization(frames, Tcb, G)
    assert g["n"] == len(preints)
    assert g["delta_r_rms"] < 1e-3
    assert v["ev_rms"] < 1e-2 and v["ep_rms"] < 1e-2
    assert ini["dv_rms"] < 1e-2 and ini["dp_rms"] < 1e-2

    # a corrupted velocity is visible in the validators
    frames[1].velocity = frames[1].velocity + 0.5
    v2 = validate.validate_velocity(frames, Tcb, np.array([0.0, 0.0, -G]))
    assert v2["ev_rms"] > 0.1

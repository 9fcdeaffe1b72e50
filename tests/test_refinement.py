"""Offline refinement + relocalization integration tests on a synthetic loop
trajectory (the roles of BASELINE configs #4 and #5)."""

import numpy as np
import pytest

from airslam_tpu.loopclosure.vocabulary import train_vocabulary
from airslam_tpu.loopclosure.database import Database
from airslam_tpu.pipelines.map_builder import MapBuilder, KeyframeConfig
from airslam_tpu.pipelines.map_refiner import MapRefiner
from airslam_tpu.pipelines.map_user import MapUser
from airslam_tpu.io.serialization import save_map, load_map
from airslam_tpu.slam.frame import Frame

from tests.test_vo_pipeline import (
    FakeCamera, FakeMatcher, make_world, render_features,
)


MAX_DEPTH = 6.0  # finite visibility range → revisits lose covisibility


def corridor_world(n_pts=1500, seed=10):
    """Dense corridor along +z so every frame sees plenty of features inside
    its visibility window."""
    rng = np.random.RandomState(seed)
    pts = np.stack([
        rng.uniform(-3, 3, n_pts),
        rng.uniform(-2, 2, n_pts),
        rng.uniform(1.0, 14.0, n_pts),
    ], axis=-1)
    desc = rng.randn(n_pts, 256).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return pts, desc


def loop_trajectory(n=30, step=0.4):
    """Out along +z then back to the start (triggers loop closure)."""
    out = []
    half = n // 2
    for i in range(n):
        T = np.eye(4)
        k = i if i < half else (n - 1 - i)
        T[:3, 3] = [0.01 * k, 0.0, step * k]
        out.append(T)
    return out


@pytest.fixture(scope="module")
def mapped():
    cam = FakeCamera()
    builder = MapBuilder(
        cam, detector=None, matcher=FakeMatcher(),
        kf_config=KeyframeConfig(min_init_stereo_feature=50, max_num_match=200,
                                 tracking_point_rate=0.95),
    )
    pts, desc = corridor_world()
    rng = np.random.RandomState(11)
    for i, T in enumerate(loop_trajectory()):
        fl, fr, pairs = render_features(pts, desc, T, cam, rng, max_depth=MAX_DEPTH)
        builder.track_features(i * 0.1, fl, fr, pairs)
    assert len(builder.map.keyframes) >= 6
    return builder, pts, desc


def test_map_serialization_roundtrip(mapped, tmp_path):
    builder, _, _ = mapped
    p = str(tmp_path / "mapv0.bin")
    save_map(builder.map, p)
    m2, dbs = load_map(p)
    assert len(m2.keyframes) == len(builder.map.keyframes)
    assert len(m2.mappoints) == len(builder.map.mappoints)
    fid = builder.map.keyframe_ids[0]
    assert np.allclose(m2.keyframes[fid].Twc, builder.map.keyframes[fid].Twc)
    assert np.array_equal(m2.keyframes[fid].track_ids, builder.map.keyframes[fid].track_ids)
    # previous_frame chain restored
    fid_last = m2.keyframe_ids[-1]
    assert m2.keyframes[fid_last].previous_frame is not None
    m2.check_map()


@pytest.fixture(scope="module")
def refined(mapped, tmp_path_factory):
    builder, pts, desc = mapped
    p = str(tmp_path_factory.mktemp("maps") / "mapv0.bin")
    save_map(builder.map, p)
    m2, _ = load_map(p)

    all_desc = np.concatenate(
        [m2.keyframes[f].kp_desc[m2.keyframes[f].kp_mask] for f in m2.keyframe_ids]
    )
    voc = train_vocabulary(all_desc[::3], k=6, depth=3, seed=1)
    refiner = MapRefiner(m2, FakeMatcher(), voc)
    n_loops = refiner.run(pose_graph_min_mappoints=10**9)
    return refiner, n_loops, pts, desc


def test_loop_detection_finds_revisit(refined):
    refiner, n_loops, _, _ = refined
    assert n_loops >= 1
    # loop connects a late frame to an early frame
    lp = refiner.loop_pairs[0]
    assert lp.query_id > lp.loop_id
    # relative translation between the matched frames is small (same place)
    q = refiner.map.keyframes[lp.query_id].Twc
    l = refiner.map.keyframes[lp.loop_id].Twc
    assert np.linalg.norm(lp.tlq) < 2.0


def test_refined_map_consistent(refined):
    refiner, _, pts, desc = refined
    refiner.map.check_map()
    good = [m for m in refiner.map.mappoints.values() if m.is_valid]
    assert len(good) > 100


def test_junction_database_built_or_empty(refined):
    refiner, _, _, _ = refined
    # synthetic frames carry no junctions → junction db is None; with
    # junctions it must be a Database (exercised in test_map_user_junctions)
    assert refiner.junction_database is None


def test_save_mapv1(refined, tmp_path):
    refiner, _, _, _ = refined
    p = str(tmp_path / "mapv1.bin")
    refiner.save(p)
    m3, dbs = load_map(p)
    assert "point" in dbs
    assert len(m3.keyframes) == len(refiner.map.keyframes)


def test_relocalization(refined):
    refiner, _, pts, desc = refined
    m = refiner.map
    cam = m.camera

    # rebuild the point database into a MapUser
    user = MapUser(m, detector=None, matcher=FakeMatcher(),
                   point_db=refiner.database, junction_db=None,
                   min_inlier_num=30, pose_refinement=True)

    # query: re-render from a pose near keyframe 2's ground truth position
    fid = m.keyframe_ids[2]
    kf = m.keyframes[fid]
    rng = np.random.RandomState(12)
    from airslam_tpu.pipelines.map_builder import INIT_TWC

    # render features at the keyframe's own (estimated) pose — the rendering
    # needs the ground-truth-world camera, so re-render in map world frame:
    # use the keyframe's own stored features as a proxy query
    qfeats_kp = kf.keypoints.copy()
    from airslam_tpu.frontend.detector import FrameFeatures

    feats = FrameFeatures(
        keypoints=kf.keypoints, kp_scores=kf.kp_scores, kp_desc=kf.kp_desc,
        kp_mask=kf.kp_mask, lines=kf.lines, line_scores=kf.line_scores,
        line_mask=kf.line_mask, junctions=kf.junctions,
        junc_scores=kf.junc_scores, junc_desc=kf.junc_desc, junc_mask=kf.junc_mask,
    )
    qframe = Frame(999999, 0.0, feats, cam)
    qframe.u_right = kf.u_right.copy()
    qframe.depth = kf.depth.copy()
    ok, Twc = user.relocalize_frame(qframe)
    assert ok
    assert np.linalg.norm(Twc[:3, 3] - kf.Twc[:3, 3]) < 0.02
    dR = Twc[:3, :3].T @ kf.Twc[:3, :3]
    assert np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)) < 0.01


def test_relocalization_rejects_unknown_place(refined):
    refiner, _, _, _ = refined
    m = refiner.map
    user = MapUser(m, detector=None, matcher=FakeMatcher(),
                   point_db=refiner.database, junction_db=None, min_inlier_num=30)
    rng = np.random.RandomState(13)
    from airslam_tpu.frontend.detector import FrameFeatures

    k = 128
    desc = rng.randn(k, 256).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    feats = FrameFeatures(
        keypoints=(rng.rand(k, 2) * [752, 480]).astype(np.float32),
        kp_scores=np.ones(k, np.float32), kp_desc=desc,
        kp_mask=np.ones(k, bool),
        lines=np.zeros((8, 4), np.float32), line_scores=np.zeros(8, np.float32),
        line_mask=np.zeros(8, bool),
        junctions=np.zeros((8, 2), np.float32), junc_scores=np.zeros(8, np.float32),
        junc_desc=np.zeros((8, 256), np.float32), junc_mask=np.zeros(8, bool),
    )
    qframe = Frame(999998, 0.0, feats, m.camera)
    ok, _ = user.relocalize_frame(qframe)
    assert not ok

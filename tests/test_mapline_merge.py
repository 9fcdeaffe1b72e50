"""Mapline merging gates (MergeMaplines, map_refiner.cc:715-954): genuine
duplicates merge; nearby-but-distinct parallel lines sharing a few points do
NOT (the 3..4-shared-point band requires the geometric same-line check)."""

import numpy as np
import jax.numpy as jnp
import pytest

from airslam_tpu.core import lie
from airslam_tpu.frontend.detector import FrameFeatures
from airslam_tpu.pipelines.map_refiner import MapRefiner
from airslam_tpu.slam.frame import Frame
from airslam_tpu.slam.landmarks import Mapline, Mappoint
from airslam_tpu.slam.map import Map

from tests.test_vo_pipeline import FakeCamera

K, L = 32, 8


def _feats():
    return FrameFeatures(
        keypoints=np.zeros((K, 2)), kp_scores=np.zeros(K),
        kp_desc=np.zeros((K, 256)), kp_mask=np.ones(K, bool),
        lines=np.zeros((L, 4)), line_scores=np.zeros(L),
        line_mask=np.ones(L, bool),
        junctions=np.zeros((4, 2)), junc_scores=np.zeros(4),
        junc_desc=np.zeros((4, 256)), junc_mask=np.zeros(4, bool),
    )


def _project_segment(cam, Twc, p1, p2):
    """2D segment observation of the 3D segment p1→p2 in frame Twc."""
    Rcw = Twc[:3, :3].T
    tcw = -Rcw @ Twc[:3, 3]
    out = []
    for p in (p1, p2):
        pc = Rcw @ p + tcw
        out.extend([cam.fx * pc[0] / pc[2] + cam.cx,
                    cam.fy * pc[1] / pc[2] + cam.cy])
    return np.asarray(out)


def _build_map(share_counts, second_line_offset):
    """Two maplines observed in disjoint frame sets; they share
    ``share_counts`` mappoints through points-on-lines; the second 3D line is
    offset by ``second_line_offset`` (0 ⇒ true duplicate)."""
    cam = FakeCamera()
    m = Map(cam)
    p1 = np.array([-1.0, 0.0, 6.0])
    p2 = np.array([1.0, 0.5, 6.0])
    off = np.asarray([0.0, second_line_offset, 0.0])

    frames = []
    for fid in range(4):
        fr = Frame(fid, fid * 0.1, _feats(), camera=cam)
        T = np.eye(4)
        T[:3, 3] = [0.1 * fid, 0.05 * fid, 0.2 * fid]
        fr.Twc = T
        m.keyframes[fid] = fr
        m.keyframe_ids.append(fid)
        frames.append(fr)

    la = Mapline(0)
    la.set_line3d(np.asarray(lie.line_from_endpoints(jnp.asarray(p1), jnp.asarray(p2))))
    la.endpoints = np.concatenate([p1, p2])
    la.endpoints_valid = True
    lb = Mapline(1)
    lb.set_line3d(np.asarray(lie.line_from_endpoints(jnp.asarray(p1 + off), jnp.asarray(p2 + off))))
    lb.endpoints = np.concatenate([p1 + off, p2 + off])
    lb.endpoints_valid = True
    m.maplines = {0: la, 1: lb}

    # mapline A observed in frames 0,1 at line slot 0; B in frames 2,3
    for fid in (0, 1):
        frames[fid].lines[0] = _project_segment(cam, frames[fid].Twc, p1, p2)
        frames[fid].mapline_ids[0] = 0
        frames[fid].line_track_ids[0] = 0
        la.add_observer(fid, 0)
    for fid in (2, 3):
        frames[fid].lines[0] = _project_segment(cam, frames[fid].Twc, p1 + off, p2 + off)
        frames[fid].mapline_ids[0] = 1
        frames[fid].line_track_ids[0] = 1
        lb.add_observer(fid, 0)

    # shared mappoints: observed on A's line in frame 0 and on B's in frame 2
    for j in range(share_counts):
        mpt = Mappoint(j, position=p1 + (p2 - p1) * (j + 1) / (share_counts + 1))
        mpt.add_observer(0, j)
        mpt.add_observer(2, j)
        m.mappoints[j] = mpt
        frames[0].mappoint_ids[j] = j
        frames[0].points_on_lines[0, j] = True
        frames[2].mappoint_ids[j] = j
        frames[2].points_on_lines[0, j] = True
    return m


def _refiner(m):
    r = MapRefiner.__new__(MapRefiner)
    r.map = m
    return r


def test_duplicates_merge_at_five_shared():
    m = _build_map(share_counts=5, second_line_offset=0.0)
    _refiner(m).merge_maplines()
    assert len(m.maplines) == 1
    keeper = m.maplines[0]
    assert set(keeper.observers) == {0, 1, 2, 3}
    assert m.keyframes[2].mapline_ids[0] == 0


def test_duplicates_merge_at_three_shared_when_same_line():
    m = _build_map(share_counts=3, second_line_offset=0.0)
    _refiner(m).merge_maplines()
    assert len(m.maplines) == 1


def test_distinct_parallel_lines_survive():
    # 3 shared points but the second line is 2 m away — the geometric gate
    # (reprojected endpoint distance) must block the merge
    m = _build_map(share_counts=3, second_line_offset=2.0)
    _refiner(m).merge_maplines()
    assert len(m.maplines) == 2
    assert set(m.maplines[0].observers) == {0, 1}
    assert set(m.maplines[1].observers) == {2, 3}


def test_many_shared_points_skip_geometry():
    # ≥5 shared points merges unconditionally (reference semantics)
    m = _build_map(share_counts=5, second_line_offset=2.0)
    _refiner(m).merge_maplines()
    assert len(m.maplines) == 1

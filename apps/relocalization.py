#!/usr/bin/env python
"""Relocalization CLI — equivalent of ``demo/relocalization.cpp``.

Loads AirSLAM_mapv1.bin (+ databases), relocalizes every image in a query
folder, writes a TUM trajectory and prints recall = success/total
(demo/relocalization.cpp:63).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--map_root", required=True)
    ap.add_argument("--query_folder", required=True)
    ap.add_argument("--traj_path", default="reloc_trajectory.txt")
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--query_stride", type=int, default=1,
                    help="relocalize every Nth query image")
    ap.add_argument("--no_recovery", action="store_true",
                    help="disable projection-guided match recovery after PnP "
                         "(the round-2 baseline behavior)")
    ap.add_argument("--diagnose", action="store_true",
                    help="print per-query stage diagnostics (candidate count, "
                         "raw pair counts, PnP/recovery/final inliers)")
    ap.add_argument("--oracle_retrieval", action="store_true",
                    help="perfect-recall retrieval (every keyframe is a "
                         "candidate): the measured recall is the MATCHING "
                         "ceiling, attributing envelope failures to "
                         "retrieval vs matching")
    from airslam_tpu.utils import device as device_util

    device_util.add_arg(ap)
    args = ap.parse_args()
    device_util.select(args.device)

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    import cv2
    import numpy as np

    from airslam_tpu.frontend.detector import FeatureDetector
    from airslam_tpu.frontend.matcher import PointMatcher
    from airslam_tpu.io.config import RelocalizationConfigs
    from airslam_tpu.io.serialization import load_map
    from airslam_tpu.io.trajectory import save_tum
    from airslam_tpu.loopclosure.database import Database
    from airslam_tpu.loopclosure.vocabulary import Vocabulary
    from airslam_tpu.models.weights import load_params
    from airslam_tpu.pipelines.map_user import MapUser

    cfg = RelocalizationConfigs.load(args.config_path)
    m, dbs = load_map(os.path.join(args.map_root, "AirSLAM_mapv1.bin"))
    print(f"loaded map: {len(m.keyframes)} keyframes")

    # rebuild databases from the embedded state
    voc_path = os.path.join(args.map_root, "point_voc.npz")
    jvoc_path = os.path.join(args.map_root, "junction_voc.npz")
    point_db = junction_db = None
    if os.path.exists(voc_path):
        point_db = Database(Vocabulary.load(voc_path))
        if "point" in dbs:
            point_db.load_state_dict(dbs["point"])
    if os.path.exists(jvoc_path):
        junction_db = Database(Vocabulary.load(jvoc_path))
        if "junction" in dbs:
            junction_db.load_state_dict(dbs["junction"])
    if point_db is None:
        raise SystemExit("point vocabulary missing (point_voc.npz in map_root)")

    det_params = mat_params = None
    if args.model_dir:
        dp = os.path.join(args.model_dir, "plnet.npz")
        mp = os.path.join(args.model_dir, "lightglue.npz")
        det_params = load_params(dp) if os.path.exists(dp) else None
        mat_params = load_params(mp) if os.path.exists(mp) else None

    if det_params is None or mat_params is None:
        from airslam_tpu.models.weights import load_default_frontend

        d0, m0 = load_default_frontend(cfg.detector.use_superpoint, cfg.matcher.matcher)
        det_params = det_params or d0
        mat_params = mat_params or m0
    detector = FeatureDetector(cfg.detector, params=det_params)
    matcher = PointMatcher(cfg.matcher, params=mat_params)
    user = MapUser(m, detector, matcher, point_db, junction_db,
                   min_inlier_num=cfg.min_inlier_num,
                   pose_refinement=cfg.pose_refinement,
                   projection_recovery=not args.no_recovery)
    user.oracle_retrieval = args.oracle_retrieval

    def stamp(name):
        try:
            return float(os.path.splitext(name)[0])
        except ValueError:
            return float("inf")

    names = sorted(os.listdir(args.query_folder), key=stamp)[::args.query_stride]
    success, trajectory = 0, []
    for name in names:
        img = cv2.imread(os.path.join(args.query_folder, name), cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        ok, Twc = user.relocalize_image(img.astype(np.float32) / 255.0)
        if args.diagnose:
            print(f"diag {name} ok={ok} {user.last_stats}", flush=True)
        if ok:
            success += 1
            try:
                ts = float(os.path.splitext(name)[0]) * 1e-9
            except ValueError:
                ts = float(len(trajectory))
            trajectory.append((ts, Twc))
    save_tum(args.traj_path, trajectory)
    total = len(names)
    print(f"recall: {success} / {total} = {success / max(total, 1):.3f}")


if __name__ == "__main__":
    main()

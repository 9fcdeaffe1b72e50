#!/usr/bin/env python
"""Offline map refinement CLI — equivalent of ``demo/map_refinement.cpp``.

Loads AirSLAM_mapv0.bin, runs loop detection + pose graph + merging + global
BA + junction vocabulary training, writes trajectory_v1.txt and
AirSLAM_mapv1.bin.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--camera_config_path", default=None)
    ap.add_argument("--map_root", required=True, help="dir with AirSLAM_mapv0.bin")
    ap.add_argument("--voc_path", default=None, help="point vocabulary .npz; trained from the map if absent")
    ap.add_argument("--model_dir", default=None)
    from airslam_tpu.utils import device as device_util

    device_util.add_arg(ap)
    args = ap.parse_args()
    device_util.select(args.device)

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    import numpy as np

    from airslam_tpu.frontend.matcher import PointMatcher
    from airslam_tpu.io.config import MapRefinementConfigs
    from airslam_tpu.io.serialization import load_map
    from airslam_tpu.io.trajectory import save_tum
    from airslam_tpu.loopclosure.vocabulary import Vocabulary, train_vocabulary
    from airslam_tpu.models.weights import load_params
    from airslam_tpu.pipelines.map_refiner import MapRefiner

    cfg = MapRefinementConfigs.load(args.config_path)
    m, _ = load_map(os.path.join(args.map_root, "AirSLAM_mapv0.bin"))
    print(f"loaded map: {len(m.keyframes)} keyframes, {len(m.mappoints)} mappoints")

    if args.voc_path and os.path.exists(args.voc_path):
        voc = Vocabulary.load(args.voc_path)
    else:
        descs = np.concatenate([
            m.keyframes[f].kp_desc[m.keyframes[f].kp_mask] for f in m.keyframe_ids
        ])
        print(f"training point vocabulary on {len(descs)} descriptors (k=10, auto depth)")
        voc = train_vocabulary(descs, k=10)
        if args.voc_path:
            voc.save(args.voc_path)

    mat_params = None
    if args.model_dir:
        mp = os.path.join(args.model_dir, "lightglue.npz")
        mat_params = load_params(mp) if os.path.exists(mp) else None
    if mat_params is None:
        from airslam_tpu.models.weights import load_default_frontend

        _, mat_params = load_default_frontend(matcher=cfg.matcher.matcher)
    matcher = PointMatcher(cfg.matcher, params=mat_params)

    refiner = MapRefiner(m, matcher, voc)
    n_loops = refiner.run(
        pose_graph_min_mappoints=cfg.pose_graph_min_mappoints)
    print(f"loop pairs: {n_loops}")
    print(f"pose graph refinement: "
          f"{'ran' if refiner.pose_graph_ran else 'skipped'}")
    print(f"merged mappoints: {refiner.n_merged_mappoints}  "
          f"maplines: {refiner.n_merged_maplines}")

    save_tum(os.path.join(args.map_root, "trajectory_v1.txt"), m.keyframe_trajectory())
    refiner.save(os.path.join(args.map_root, "AirSLAM_mapv1.bin"))
    # vocabularies ride next to the map so apps/relocalization.py can rebuild
    # the databases (demo/relocalization.cpp loads them from the map archive)
    voc.save(args.voc_path or os.path.join(args.map_root, "point_voc.npz"))
    if refiner.junction_database is not None:
        refiner.junction_database.voc.save(
            os.path.join(args.map_root, "junction_voc.npz"))
    print("saved trajectory_v1.txt, AirSLAM_mapv1.bin and vocabularies")


if __name__ == "__main__":
    main()

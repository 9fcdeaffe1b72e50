#!/usr/bin/env python
"""Feature detection demo — equivalent of ``demo/test_feature.cpp``: run the
detector over an image folder and write annotated line/keypoint images
(the de-facto detector unit test, SURVEY §3.4)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--camera_config_path", default=None)
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--max_keypoints", type=int, default=400)
    ap.add_argument("--keypoint_threshold", type=float, default=0.004)
    ap.add_argument("--line_threshold", type=float, default=0.5)
    ap.add_argument("--line_length_threshold", type=float, default=50.0)
    from airslam_tpu.utils import device as device_util

    device_util.add_arg(ap)
    args = ap.parse_args()
    device_util.select(args.device)

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    import cv2
    import numpy as np
    import jax.tree_util as jtu

    from airslam_tpu.core.camera import Camera
    from airslam_tpu.frontend.detector import FeatureDetector, DetectorConfig
    from airslam_tpu.frontend.lines import point_line_relation
    from airslam_tpu.models.weights import load_params
    from airslam_tpu.ops.gridsample import remap
    from airslam_tpu.utils.debugviz import save_line_detection_result
    import jax.numpy as jnp

    cfg = DetectorConfig(
        max_keypoints=args.max_keypoints,
        keypoint_threshold=args.keypoint_threshold,
        line_threshold=args.line_threshold,
        line_length_threshold=args.line_length_threshold,
        use_superpoint=False,
    )
    det_params = None
    if args.model_dir:
        dp = os.path.join(args.model_dir, "plnet.npz")
        det_params = load_params(dp) if os.path.exists(dp) else None
    if det_params is None:
        from airslam_tpu.models.weights import load_default_frontend

        det_params, _ = load_default_frontend(use_superpoint=False)
    detector = FeatureDetector(cfg, params=det_params)

    camera = Camera(args.camera_config_path) if args.camera_config_path else None
    ml = camera.rectify_maps()[0] if camera else None

    os.makedirs(args.save_dir, exist_ok=True)
    for name in sorted(os.listdir(args.image_dir)):
        img = cv2.imread(os.path.join(args.image_dir, name), cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        imgf = img.astype(np.float32) / 255.0
        if ml is not None:
            imgf = np.asarray(remap(jnp.asarray(imgf), ml))
        feats = detector.detect(imgf[None], detect_junctions=True)
        f = jtu.tree_map(lambda t: np.asarray(t[0]), feats)
        rel, _ = point_line_relation(
            jnp.asarray(f.lines), jnp.asarray(f.line_mask),
            jnp.asarray(f.keypoints), jnp.asarray(f.kp_mask),
        )
        save_line_detection_result(
            os.path.join(args.save_dir, name), imgf, f.lines, f.line_mask,
            f.keypoints, f.kp_mask, np.asarray(rel),
        )
        print(f"{name}: {int(f.kp_mask.sum())} keypoints, {int(f.line_mask.sum())} lines")


if __name__ == "__main__":
    main()

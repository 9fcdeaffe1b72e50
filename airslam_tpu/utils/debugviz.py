"""Debug image writers.

Replaces ``src/debug.cc`` (detections, matches, stereo matches, tracking,
line detection, point-line relations, BoW match mosaics — debug.h:19-59).
All functions take numpy grayscale images in [0, 1] and write PNGs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _to_bgr(image: np.ndarray) -> np.ndarray:
    img8 = np.clip(image * 255.0, 0, 255).astype(np.uint8)
    return cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR)


def _color(i: int):
    rng = np.random.RandomState(i * 7919 + 13)
    return tuple(int(c) for c in rng.randint(50, 255, 3))


def save_detector_result(path, image, keypoints, kp_mask=None):
    """Keypoint overlay (``SaveDetectorResult``)."""
    img = _to_bgr(image)
    for i, (x, y) in enumerate(np.asarray(keypoints)):
        if kp_mask is not None and not kp_mask[i]:
            continue
        cv2.circle(img, (int(x), int(y)), 2, (0, 255, 0), -1)
    cv2.imwrite(path, img)


def save_line_detection_result(path, image, lines, line_mask=None,
                               keypoints=None, kp_mask=None, relation=None):
    """Line (+ optional point-on-line) overlay (``SaveLineDetectionResult``/
    ``SavePointLineRelation``)."""
    img = _to_bgr(image)
    lines = np.asarray(lines)
    for i, (x1, y1, x2, y2) in enumerate(lines):
        if line_mask is not None and not line_mask[i]:
            continue
        c = _color(i)
        cv2.line(img, (int(x1), int(y1)), (int(x2), int(y2)), c, 2)
        if relation is not None and keypoints is not None:
            for j in np.nonzero(relation[i])[0]:
                x, y = keypoints[j]
                cv2.circle(img, (int(x), int(y)), 3, c, -1)
    if keypoints is not None and relation is None:
        for j, (x, y) in enumerate(np.asarray(keypoints)):
            if kp_mask is not None and not kp_mask[j]:
                continue
            cv2.circle(img, (int(x), int(y)), 2, (0, 255, 0), -1)
    cv2.imwrite(path, img)


def save_matching_result(path, image0, kpts0, image1, kpts1, pairs):
    """Side-by-side match visualization (``SaveMatchingResult``/
    ``SaveStereoMatchResult``)."""
    h = max(image0.shape[0], image1.shape[0])
    w0 = image0.shape[1]
    canvas = np.zeros((h, w0 + image1.shape[1]), image0.dtype)
    canvas[: image0.shape[0], :w0] = image0
    canvas[: image1.shape[0], w0:] = image1
    img = _to_bgr(canvas)
    for k, (i0, i1) in enumerate(np.asarray(pairs)):
        x0, y0 = kpts0[i0]
        x1, y1 = kpts1[i1]
        c = _color(k)
        cv2.line(img, (int(x0), int(y0)), (int(x1) + w0, int(y1)), c, 1)
        cv2.circle(img, (int(x0), int(y0)), 2, c, -1)
        cv2.circle(img, (int(x1) + w0, int(y1)), 2, c, -1)
    cv2.imwrite(path, img)


def save_tracking_result(path, image0, frame0_kpts, image1, frame1_kpts, pairs,
                         save_root: Optional[str] = None):
    save_matching_result(path, image0, frame0_kpts, image1, frame1_kpts, pairs)

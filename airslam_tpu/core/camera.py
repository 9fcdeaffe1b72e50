"""Stereo(-inertial) camera model.

Replaces ``src/camera.cc`` / ``include/camera.h`` of the reference. The YAML
schema is identical (``configs/camera/*.yaml``: ``image_height``, ``cam0/cam1``
with ``intrinsics``/``distortion_coeffs``/``T``/``T_type``, ``distortion_type``
0/1/2, IMU noise block).

TPU-native split:
- Host init (this file): parse YAML, run ``cv::stereoRectify`` +
  ``initUndistortRectifyMap`` exactly like ``src/camera.cc:40-86`` to get the
  rectified pinhole intrinsics and float32 remap grids. This happens once.
- Device compute: the remap grids are uploaded as arrays; per-frame
  rectification is a bilinear gather executed inside the fused frontend XLA
  graph (``airslam_tpu.ops.gridsample.remap``), not ``cv::remap`` on the host.
- Projection/back-projection are pure jnp functions over an ``Intrinsics``
  pytree so they can be used inside residuals/jacobians.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import yaml

try:  # OpenCV is used only at construction time (rectify-map precompute).
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Intrinsics:
    """Rectified pinhole intrinsics + stereo baseline; a jit-able pytree."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray  # fx * baseline
    width: int = 752
    height: int = 480

    def tree_flatten(self):
        return (self.fx, self.fy, self.cx, self.cy, self.bf), (self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, width=aux[0], height=aux[1])

    # -- jnp ops (batched over leading dims) --------------------------------

    def project(self, p3d):
        """(…, 3) camera-frame points -> (…, 2) pixels. camera.h:56-72."""
        z_inv = 1.0 / p3d[..., 2]
        u = p3d[..., 0] * z_inv * self.fx + self.cx
        v = p3d[..., 1] * z_inv * self.fy + self.cy
        return jnp.stack([u, v], axis=-1)

    def stereo_project(self, p3d):
        """(…, 3) -> (…, 3) = (u_left, v, u_right). camera.h:74-90."""
        z_inv = 1.0 / p3d[..., 2]
        u = p3d[..., 0] * z_inv * self.fx + self.cx
        v = p3d[..., 1] * z_inv * self.fy + self.cy
        ur = u - self.bf * z_inv
        return jnp.stack([u, v, ur], axis=-1)

    def in_image(self, uv):
        return (
            (uv[..., 0] >= 0)
            & (uv[..., 0] < self.width)
            & (uv[..., 1] >= 0)
            & (uv[..., 1] < self.height)
        )

    def back_project_mono(self, uv):
        """(…, 2) pixels -> (…, 3) unit-depth rays. camera.cc:268-273."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def back_project_stereo(self, uvr):
        """(…, 3) = (u_left, v, u_right) -> (…, 3) points. camera.cc:275-280."""
        ray = self.back_project_mono(uvr[..., :2])
        depth = self.bf / (uvr[..., 0] - uvr[..., 2])
        return ray * depth[..., None]

    def depth_from_disparity(self, disp):
        return self.bf / disp


class Camera:
    """Host-side camera: YAML parsing, rectification-map precompute, IMU noise.

    Mirrors the public surface of the reference ``Camera`` (camera.h:22-92).
    """

    def __init__(self, camera_file: Optional[str] = None, node: Optional[dict] = None):
        if node is None:
            with open(camera_file, "r") as f:
                text = f.read()
            # OpenCV-style "%YAML:1.0" headers are not valid YAML 1.1 — strip.
            lines = [l for l in text.splitlines() if not l.startswith("%YAML")]
            node = yaml.safe_load("\n".join(lines))

        self.image_height = int(node["image_height"])
        self.image_width = int(node["image_width"])
        self.depth_lower_thr = float(node["depth_lower_thr"])
        self.depth_upper_thr = float(node["depth_upper_thr"])
        self.max_y_diff = float(node["max_y_diff"])

        K0, D0, Tbc0 = _read_camera_node(node["cam0"])
        K1, D1, Tbc1 = _read_camera_node(node["cam1"])
        Tc1c0 = np.linalg.inv(Tbc1) @ Tbc0
        self.Tbc = Tbc0
        self.Tcb = np.linalg.inv(Tbc0)

        self.map_left = None  # (H, W, 2) float32 source-pixel grid or None
        self.map_right = None
        self.rect = None  # stereoRectify internals (K/D/R/P per cam) or None

        distortion_type = int(node["distortion_type"])
        if distortion_type == 0:
            fx, fy, cx, cy = K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]
            bf = fx * abs(Tc1c0[0, 3])
        else:
            if cv2 is None:
                raise RuntimeError("OpenCV required for distortion_type != 0")
            size = (self.image_width, self.image_height)
            R10 = np.ascontiguousarray(Tc1c0[:3, :3])
            t10 = np.ascontiguousarray(Tc1c0[:3, 3]).reshape(3, 1)
            if distortion_type == 1:
                R0, R1, P0, P1, _, _, _ = cv2.stereoRectify(
                    K0, D0, K1, D1, size, R10, t10, flags=cv2.CALIB_ZERO_DISPARITY, alpha=0
                )
                ml1, ml2 = cv2.initUndistortRectifyMap(K0, D0, R0, P0[:3, :3], size, cv2.CV_32FC1)
                mr1, mr2 = cv2.initUndistortRectifyMap(K1, D1, R1, P1[:3, :3], size, cv2.CV_32FC1)
            else:
                R0, R1, P0, P1, _ = cv2.fisheye.stereoRectify(
                    K0, D0[:4].reshape(4, 1), K1, D1[:4].reshape(4, 1), size, R10,
                    t10.reshape(3, 1), flags=cv2.CALIB_ZERO_DISPARITY, balance=0, fov_scale=0.8
                )
                ml1, ml2 = cv2.fisheye.initUndistortRectifyMap(
                    K0, D0[:4].reshape(4, 1), R0, P0[:3, :3], size, cv2.CV_32FC1
                )
                mr1, mr2 = cv2.fisheye.initUndistortRectifyMap(
                    K1, D1[:4].reshape(4, 1), R1, P1[:3, :3], size, cv2.CV_32FC1
                )
            self.map_left = np.stack([ml1, ml2], axis=-1)
            self.map_right = np.stack([mr1, mr2], axis=-1)
            # expose the rectification geometry: apps/make_synth_dataset.py
            # inverse-warps rendered rectified views into the distorted
            # domain (cv2.undistortPoints with R/P) to synthesize raw
            # distorted input the pipeline must rectify (camera.cc:161-182)
            self.rect = dict(type=distortion_type, K0=K0, D0=D0, K1=K1,
                             D1=D1, R0=R0, R1=R1, P0=P0, P1=P1)
            bf = abs(P1[0, 3])
            fx, fy, cx, cy = P0[0, 0], P0[1, 1], P0[0, 2], P0[1, 2]

        self.fx, self.fy, self.cx, self.cy = float(fx), float(fy), float(cx), float(cy)
        self.bf = float(bf)
        self.max_x_diff = self.bf / self.depth_lower_thr
        self.min_x_diff = self.bf / self.depth_upper_thr

        # IMU noise scaled by sqrt(rate), camera.cc:89-103.
        self.use_imu = bool(int(node.get("use_imu", 0)))
        self.g_value = 9.81
        self.imu_frequency = 0.0
        self.gyr_noise = self.acc_noise = self.gyr_walk = self.acc_walk = 0.0
        if self.use_imu:
            self.imu_frequency = float(node["rate_hz"])
            sq = float(np.sqrt(self.imu_frequency))
            self.gyr_noise = float(node["gyroscope_noise_density"]) * sq
            self.acc_noise = float(node["accelerometer_noise_density"]) * sq
            self.gyr_walk = float(node["gyroscope_random_walk"]) / sq
            self.acc_walk = float(node["accelerometer_random_walk"]) / sq
            self.g_value = float(node["g_value"])

    def intrinsics(self, dtype=jnp.float32) -> Intrinsics:
        return Intrinsics(
            fx=jnp.asarray(self.fx, dtype),
            fy=jnp.asarray(self.fy, dtype),
            cx=jnp.asarray(self.cx, dtype),
            cy=jnp.asarray(self.cy, dtype),
            bf=jnp.asarray(self.bf, dtype),
            width=self.image_width,
            height=self.image_height,
        )

    def rectify_maps(self, dtype=jnp.float32):
        """Remap grids as device arrays (or None when undistorted input)."""
        if self.map_left is None:
            return None, None
        return jnp.asarray(self.map_left, dtype), jnp.asarray(self.map_right, dtype)

    def remap_plans(self):
        """Tiled-remap plans for the Pallas rectification kernel
        (ops/remap_tiled.py), built lazily once per camera; (None, None)
        when the input is already rectified or the grid defeats tiling."""
        if self.map_left is None:
            return None, None
        if getattr(self, "_remap_plans", None) is None:
            from airslam_tpu.ops import remap_tiled

            shape = self.map_left.shape[:2]
            self._remap_plans = (
                remap_tiled.build_plan(self.map_left, shape),
                remap_tiled.build_plan(self.map_right, shape),
            )
        return self._remap_plans


def _read_camera_node(cam_node):
    """camera.cc:140-166: intrinsics [fx,fy,cx,cy], 5 distortion coeffs, Tbc."""
    intr = [float(x) for x in cam_node["intrinsics"]]
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1]], dtype=np.float64)
    D = np.array([float(x) for x in cam_node["distortion_coeffs"]], dtype=np.float64)
    T = np.array(cam_node["T"], dtype=np.float64).reshape(4, 4)
    if int(cam_node.get("T_type", 0)):
        T = np.linalg.inv(T)  # Kalibr gives Tcb
    return K, D, T

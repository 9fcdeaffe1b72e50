from airslam_tpu.core import lie, camera, imu  # noqa: F401

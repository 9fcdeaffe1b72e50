"""airslam_tpu — a TPU-native (JAX/XLA/Pallas) point-line visual/visual-inertial
SLAM framework with the capabilities of sair-lab/AirSLAM.

Architecture (TPU-first, not a translation of the C++/CUDA reference):

- ``core``       : SO(3)/SE(3)/Plücker Lie ops, camera models, IMU preintegration
                   (all jit-able, `lax.scan`-based; reference: src/imu.cc, src/camera.cc)
- ``models``     : PLNet (unified point+line CNN), SuperPoint, LightGlue, SuperGlue
                   as JAX convnets / attention stacks (reference: TensorRT engines in
                   src/plnet.cpp, src/super_point.cpp, src/light_glue.cpp, src/super_glue.cpp)
- ``ops``        : fixed-shape TPU kernels — top-k keypoint decode, bilinear
                   grid-sample, wireframe dedup, match decode, Sinkhorn, attention
- ``frontend``   : fused per-frame detect+match graphs (one jitted XLA program per
                   frame instead of 4 TensorRT executions with host round-trips)
- ``backend``    : batched Gauss-Newton/LM with Schur elimination over fixed-size
                   windows (replaces g2o: src/g2o_optimization/*)
- ``slam``       : Frame/Mappoint/Mapline/Map registries, covisibility, keyframe policy
- ``loopclosure``: vocabulary-as-tensor BoW (batched matmul scoring), inverted file,
                   hierarchical k-means training (replaces DBoW2)
- ``pipelines``  : map_builder (VO/VIO), map_refiner (offline), map_user (reloc)
- ``io``         : ASL/EuRoC dataset, YAML configs (reference schema), map
                   serialization (v0/v1), TUM trajectory writers, publisher interface
- ``parallel``   : mesh/sharding utilities for multi-chip batched BA, vocab scoring
                   and model fine-tuning
"""

__version__ = "0.1.0"

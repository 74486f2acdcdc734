"""rpeflow_tpu: a TPU-native framework for joint 2D optical flow and 3D scene
flow estimation from RGB image pairs, LiDAR point clouds and event-camera
streams.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the full
capability surface of the reference RPEFlow (ICCV 2023) codebase:

- ``rpeflow_tpu.ops``      low-level ops (knn, fps, correlation, warping, ...)
- ``rpeflow_tpu.nn``       Flax building blocks (pyramids, PointConv, MDTA, ...)
- ``rpeflow_tpu.model``    the RPEFlow model assembly, losses and metrics
- ``rpeflow_tpu.data``     host-side datasets, augmentation, event voxelization
- ``rpeflow_tpu.train``    config system, trainer (data-parallel over a mesh),
                           and evaluation drivers
- ``rpeflow_tpu.parallel`` device-mesh / sharding helpers
- ``rpeflow_tpu.compat``   torch-checkpoint -> jax parameter conversion
"""

__version__ = "0.1.0"

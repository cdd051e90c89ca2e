"""UPP-TPU: a TPU-native JAX/Pallas framework for robust point-cloud analysis.

Re-implements the capabilities of ICCV2025-UPP ("Unified Point-Level Prompting
for Robust Point Cloud Analysis") as a TPU-first framework:

* ``upp_tpu.ops``      — geometry kernels (FPS, kNN, grouping, Chamfer, EMD)
  and the on-device corruption pipeline (shell/lidar noise, viewpoint crop,
  augmentations). These replace the reference's CUDA extensions
  (pointnet2_ops, KNN_CUDA, extensions/chamfer_dist, extensions/emd).
* ``upp_tpu.models``   — prompted point transformer model zoo (rectify /
  completion / downstream prompt paths, adapters, prompt propagation).
* ``upp_tpu.data``     — dataset registry + host input pipeline.
* ``upp_tpu.train``    — runners, PEFT optimizer masks, checkpointing.
* ``upp_tpu.parallel`` — mesh construction and sharded train steps
  (replaces torch.distributed/NCCL with jax.sharding over ICI/DCN).
* ``upp_tpu.utils``    — config (YAML + ``_base_`` includes), registry, logging.
"""

__version__ = "0.1.0"

"""physics_informed_image_segmentation_tpu — TPU-native PDE-constrained segmentation.

A from-scratch JAX / Flax / Pallas / pjit framework with the
capabilities of the reference ``Physics_informed_image_segmentation``
codebase (PDE-regularized U-Net cell segmentation, two-stage training,
ablation/sensitivity studies, statistical evaluation), re-designed for
TPU: NHWC Flax models, fused Pallas stencil kernels for the physics
loss, jit/scan training with on-device metrics, and mesh-sharded
data/spatial parallelism.
"""

from . import models, ops  # noqa: F401

__version__ = "0.1.0"

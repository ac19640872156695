"""aide_tpu — a TPU-native annotation-efficient medical image segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lich0031/AIDE
(Nature-Communications "Annotation-effIcient Deep lEarning" for segmentation
from imperfect datasets): limited annotations (semi-supervised), missing
target-domain annotations (cross-domain transfer), and noisy annotations.

Design (see SURVEY.md for the reference analysis):
  * one config-driven engine replaces the reference's 17 copy-paste trainers
  * dual-network co-teaching runs as a single jitted XLA program with the two
    networks stacked on a vmapped "net" axis
  * test-time-augmentation (TTA) and its inverse run on device as batched
    affine warps (the reference round-trips every view through PIL on host)
  * data parallel over a `jax.sharding.Mesh`; collectives ride ICI
  * self-contained medical-image IO (DICOM / NIfTI-1 / NRRD / palette PNG)
"""

__version__ = "0.1.0"

from aide_tpu.core.config import (  # noqa: F401
    TrainConfig,
    ModelConfig,
    DataConfig,
    OptimConfig,
    CoteachConfig,
    EvalConfig,
)

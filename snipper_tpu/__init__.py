"""snipper_tpu — a TPU-native (JAX/XLA/Pallas) framework for multi-person 3D pose
estimation, tracking and forecasting from video snippets.

Re-designed from scratch for TPU with the capabilities of the reference
JimmyZou/Snipper (a Deformable-DETR-style spatiotemporal transformer):

- ``snipper_tpu.ops``       — multi-scale temporal deformable attention
                              (pure-XLA reference + Pallas TPU kernel)
- ``snipper_tpu.models``    — ResNet-50 backbone, 3D sine position encoding,
                              temporal deformable transformer, Snipper model
- ``snipper_tpu.matching``  — device-side Hungarian (Jonker-Volgenant) matcher
- ``snipper_tpu.losses``    — set criterion (6 losses, padded/masked, jit-able)
- ``snipper_tpu.data``      — snippet pipeline, augmentation, dataset readers
- ``snipper_tpu.parallel``  — mesh / sharding utilities (dp + tp axes)
- ``snipper_tpu.train``     — pjit train step, optimizer groups, checkpointing
- ``snipper_tpu.eval``      — MPJPE / 3DPCK / PCKh / MOT metrics
- ``snipper_tpu.infer``     — snippet inference + cross-snippet association
"""

__version__ = "0.1.0"

from snipper_tpu.config import Config  # noqa: F401

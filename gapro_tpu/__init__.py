"""gapro_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of GaPro.

GaPro (ICCV 2023) is box-supervised 3D point-cloud instance segmentation:

1. A Gaussian-Process pseudo-labeler converts axis-aligned 3D box annotations
   into per-point instance masks with uncertainty (``gapro_tpu.labeler``,
   ``gapro_tpu.gp``).
2. Two instance-segmentation networks consume those pseudo labels:
   ISBNet (dynamic-convolution kernels) and SPFormer (superpoint transformer)
   — ``gapro_tpu.models`` — trained with uncertainty-aware losses
   (``gapro_tpu.losses``).

Everything is designed TPU-first: static shapes with power-of-two bucketing,
sort/searchsorted-based sparse-voxel rulebooks feeding gather-GEMM convs on
the MXU, vmapped/batched GP solves, and data-parallel sharding via
``jax.sharding.Mesh`` + jit (see ``gapro_tpu.parallel``).

Reference behavior studied from VinAIResearch/GaPro (see SURVEY.md); this is
a from-scratch reimplementation, not a port.
"""

__version__ = "0.1.0"

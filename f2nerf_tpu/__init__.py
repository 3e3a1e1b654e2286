"""f2nerf_tpu: a TPU-native neural radiance field framework with the
capabilities of F2-NeRF (CVPR 2023, arxiv 2303.15951).

Built from scratch in JAX/XLA/Pallas; see ARCHITECTURE.md. The reference
implementation surveyed in SURVEY.md is a single-GPU LibTorch/CUDA app;
this package keeps its user-facing surface (config tree, dataset formats,
output layout) while re-designing the compute path for TPU.
"""

__version__ = "0.1.0"

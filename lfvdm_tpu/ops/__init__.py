"""Pallas TPU kernels — the native kernel layer of the framework.

The reference's native compute lives in PyTorch/cuDNN CUDA kernels
(SURVEY.md §2.9); here the hot attention ops are hand-fused Pallas TPU
kernels, with XLA handling convs/matmuls (where it is already optimal).
"""

from .attention import (  # noqa: F401
    pallas_available,
    spatial_attention,
    spatial_attention_reference,
    temporal_rpe_attention,
    temporal_rpe_attention_reference,
)

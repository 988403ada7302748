"""Fused substep path: persistent chunk-slot particle state + fused Pallas
g2p / p2g kernels (the TPU counterpart of the reference's single g2p2g CUDA
kernel, ref: sparkl `src_kernels/cuda/g2p2g.rs`)."""

from sparkl_tpu.fused.pipeline import FusedMpmPipeline

__all__ = ["FusedMpmPipeline"]

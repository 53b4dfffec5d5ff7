"""cadepth_tpu — TPU-native camera-aware depth estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
RyoK3N/Camera-Aware-Neural-Networks-for-Few-View-Depth-Estimation
(C++/LibTorch reference): SUN RGB-D dataset tooling, ray-direction
geometry, camera-conditioned U-Net model families (FiLM / CBAM / PCL),
a four-term depth loss zoo, 9+ depth metrics with statistical testing,
trainers with checkpointing / early stopping / TensorBoard, and an
evaluation + visualization pipeline — redesigned TPU-first:

* NHWC tensor layout (TPU conv-native), bf16 compute / fp32 params.
* Everything in the compute path is a pure, jittable function.
* Masked reductions are fixed-shape ``where``-sums (no dynamic shapes).
* Data parallelism via ``jax.sharding.Mesh`` + jit-SPMD (no NCCL).
* Ray grids are fused on-device per batch instead of precomputed files
  (a ``rays.bin``-compatible CLI is kept for format parity).
"""

from cadepth_tpu.version import __version__

__all__ = ["__version__"]

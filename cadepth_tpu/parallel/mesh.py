"""Device mesh + sharding helpers for data-parallel training.

The reference has no distributed execution at all — its
`hardware.distributed`/`backend: nccl` YAML is dead config
(`train_config.yaml:176-183`, SURVEY §2.9). Here data parallelism is
first-class and TPU-native: a 1-D `jax.sharding.Mesh` over all chips,
batches sharded on the `data` axis, parameters/optimizer state
replicated, and XLA's SPMD partitioner inserting the gradient
all-reduces over ICI (no hand-written collectives, no NCCL).

At this model scale (<40M params) pure DP is the right mapping; the
mesh helpers accept extra axes so tensor-parallel dimensions can be
added without API change.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "data",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices (0 = all)."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(num_devices: int = 0, spatial: int = 1,
                 axis_names: Sequence[str] = ("data", "space"),
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D (data × space) mesh: batch sharded on axis 0, image height on
    axis 1. XLA's SPMD partitioner inserts the convolution halo
    exchanges for the spatial axis automatically — this is how single
    images scale past one chip's HBM when resolution grows (SURVEY
    §5.7: the reference's scaling axis is spatial, not sequence).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    if spatial <= 1:
        return Mesh(np.array(devs), (axis_names[0],))
    if len(devs) % spatial != 0:
        raise ValueError(
            f"{len(devs)} devices not divisible by spatial={spatial}")
    grid = np.array(devs).reshape(len(devs) // spatial, spatial)
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) sharding for a 2-D mesh: batch over 'data', height
    over 'space' (falls back to batch-only on a 1-D mesh)."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def batch_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Per-key shardings for a data batch dict (image tensors get the
    spatial axis when present; per-sample vectors are batch-sharded)."""
    img = image_sharding(mesh)
    vec = batch_sharding(mesh)
    return {"rgb": img, "depth": img, "rays": img,
            "intrinsics": vec, "k4": vec, "extrinsics": vec}


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh,
                axis_name: str = "data") -> Dict[str, jax.Array]:
    table = batch_shardings(mesh)
    default = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, table.get(k, default))
            for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Place a TrainState (or any pytree) replicated over the mesh."""
    return jax.device_put(state, replicate_sharding(mesh))

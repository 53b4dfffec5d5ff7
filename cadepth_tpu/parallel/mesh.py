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


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh,
                axis_name: str = "data") -> Dict[str, jax.Array]:
    sharding = batch_sharding(mesh, axis_name)
    return jax.device_put(batch, sharding)


def replicate_state(state, mesh: Mesh):
    """Place a TrainState (or any pytree) replicated over the mesh."""
    return jax.device_put(state, replicate_sharding(mesh))

"""Config-driven model factory.

Ports `createModel` (`src/training/train_main.cpp:172-218`) and — unlike
the reference, where the live path hardcodes BaselineUNet
(`train_main.cpp:324-333`, marked TODO) — is actually the single way
trainers and evaluators construct models.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cadepth_tpu.models.baseline_unet import BaselineUNet
from cadepth_tpu.models.geometry_aware import (
    GeometryAwareNetwork,
    LightweightGeometryNetwork,
)
from cadepth_tpu.models.intrinsics_unet import (
    IntrinsicsAttentionUNet,
    IntrinsicsConditionedUNet,
)

ARCHITECTURES = (
    "baseline_unet",
    "intrinsics_unet",
    "intrinsics_attention_unet",
    "geometry_aware",
    "geometry_aware_lightweight",
)


def create_model(
    architecture: str,
    in_channels: int = 3,
    init_features: int = 64,
    camera_dim: int = 4,
    max_depth: float = 10.0,
    use_pcl: bool = True,
    use_attention: bool = True,
    variant: str = "full",
    remat: bool = False,
    dtype: Any = jnp.bfloat16,
) -> nn.Module:
    """Build a model by architecture string (train_config.yaml `model:` block).

    Dispatch parity with `createModel` (`train_main.cpp:186-213`):
    `intrinsics_unet` + `use_attention` selects the CBAM variant, and
    `geometry_aware` honors `variant: full|lightweight`.
    `intrinsics_attention_unet` is an explicit alias.
    """
    if architecture == "baseline_unet":
        return BaselineUNet(in_channels=in_channels, init_features=init_features,
                            max_depth=max_depth, remat=remat, dtype=dtype)
    if architecture == "intrinsics_unet":
        if use_attention:
            return IntrinsicsAttentionUNet(
                in_channels=in_channels, init_features=init_features,
                camera_dim=camera_dim, max_depth=max_depth, remat=remat,
                dtype=dtype)
        return IntrinsicsConditionedUNet(
            in_channels=in_channels, init_features=init_features,
            camera_dim=camera_dim, max_depth=max_depth, remat=remat,
            dtype=dtype)
    if architecture == "intrinsics_attention_unet":
        return IntrinsicsAttentionUNet(
            in_channels=in_channels, init_features=init_features,
            camera_dim=camera_dim, max_depth=max_depth, remat=remat,
            dtype=dtype)
    if architecture == "geometry_aware":
        if variant == "lightweight":
            return LightweightGeometryNetwork(
                in_channels=in_channels, init_features=min(init_features, 32),
                camera_dim=camera_dim, max_depth=max_depth, remat=remat,
                dtype=dtype)
        return GeometryAwareNetwork(
            in_channels=in_channels, init_features=init_features,
            camera_dim=camera_dim, max_depth=max_depth,
            use_pcl=use_pcl, use_attention=use_attention, remat=remat,
            dtype=dtype)
    if architecture == "geometry_aware_lightweight":
        return LightweightGeometryNetwork(
            in_channels=in_channels, init_features=min(init_features, 32),
            camera_dim=camera_dim, max_depth=max_depth, remat=remat,
            dtype=dtype)
    raise ValueError(
        f"Unknown architecture '{architecture}'; expected one of {ARCHITECTURES}")


def model_inputs(architecture: str, batch: Dict[str, jax.Array],
                 train: bool = False) -> Tuple[tuple, dict]:
    """(args, kwargs) to apply a model to a data batch dict.

    Batch keys: 'rgb' (B,H,W,3), 'rays' (B,H,W,3), 'k4' (B,4).
    """
    if architecture == "baseline_unet":
        return (batch["rgb"],), {"train": train}
    if architecture in ("intrinsics_unet", "intrinsics_attention_unet"):
        return (batch["rgb"], batch["k4"]), {"train": train}
    if architecture in ("geometry_aware", "geometry_aware_lightweight"):
        return (batch["rgb"], batch["rays"], batch["k4"]), {"train": train}
    raise ValueError(f"Unknown architecture '{architecture}'")


def count_parameters(params) -> int:
    """Total parameter count (parity with `count_parameters`, `baseline_unet.h:200-206`)."""
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def estimate_memory_mb(params, batch_size: int, height: int, width: int,
                       init_features: int = 64) -> float:
    """Rough activation+param memory estimate in MB.

    Mirrors `GeometryAwareNetworkImpl::estimate_memory_mb`
    (`geometry_aware_network.h:339-360`).
    """
    pixels = batch_size * height * width
    enc = pixels * (init_features + init_features * 2 // 4 +
                    init_features * 4 // 16 + init_features * 8 // 64 +
                    init_features * 16 // 256)
    total_bytes = (enc * 2 + count_parameters(params)) * 4
    return total_bytes / (1024.0 * 1024.0)

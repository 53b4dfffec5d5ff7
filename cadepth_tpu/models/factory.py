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
    pcl_warp: str = "two_pass",
    norm: str = "batch",
    decoder_upsample: str = "transpose",
    sa_lowering: str = "toeplitz",
    dtype: Any = jnp.bfloat16,
) -> nn.Module:
    """Build a model by architecture string (train_config.yaml `model:` block).

    Dispatch parity with `createModel` (`train_main.cpp:186-213`):
    `intrinsics_unet` + `use_attention` selects the CBAM variant, and
    `geometry_aware` honors `variant: full|lightweight`.
    `intrinsics_attention_unet` is an explicit alias. ``norm`` and
    ``decoder_upsample`` are TPU performance experiment knobs
    (models/layers.py apply_norm / upsample2x); the defaults are
    reference parity. ``sa_lowering`` picks the spatial-attention conv
    lowering (models/attention.py SpatialGateConv — same math and
    params, TPU-friendly GEMM by default).
    """
    exp_kw = dict(norm=norm, decoder_upsample=decoder_upsample)
    att_kw = dict(sa_lowering=sa_lowering, **exp_kw)
    if architecture == "baseline_unet":
        return BaselineUNet(in_channels=in_channels, init_features=init_features,
                            max_depth=max_depth, remat=remat, dtype=dtype,
                            **exp_kw)
    if architecture == "intrinsics_unet":
        if use_attention:
            return IntrinsicsAttentionUNet(
                in_channels=in_channels, init_features=init_features,
                camera_dim=camera_dim, max_depth=max_depth, remat=remat,
                dtype=dtype, **att_kw)
        return IntrinsicsConditionedUNet(
            in_channels=in_channels, init_features=init_features,
            camera_dim=camera_dim, max_depth=max_depth, remat=remat,
            dtype=dtype, **exp_kw)
    if architecture == "intrinsics_attention_unet":
        return IntrinsicsAttentionUNet(
            in_channels=in_channels, init_features=init_features,
            camera_dim=camera_dim, max_depth=max_depth, remat=remat,
            dtype=dtype, **att_kw)
    if architecture == "geometry_aware":
        if variant == "lightweight":
            return LightweightGeometryNetwork(
                in_channels=in_channels, init_features=min(init_features, 32),
                camera_dim=camera_dim, max_depth=max_depth, remat=remat,
                pcl_warp=pcl_warp, dtype=dtype, **att_kw)
        return GeometryAwareNetwork(
            in_channels=in_channels, init_features=init_features,
            camera_dim=camera_dim, max_depth=max_depth,
            use_pcl=use_pcl, use_attention=use_attention, remat=remat,
            pcl_warp=pcl_warp, dtype=dtype, **att_kw)
    if architecture == "geometry_aware_lightweight":
        return LightweightGeometryNetwork(
            in_channels=in_channels, init_features=min(init_features, 32),
            camera_dim=camera_dim, max_depth=max_depth, remat=remat,
            pcl_warp=pcl_warp, dtype=dtype, **att_kw)
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
                       init_features: int = 64, levels: int = 5,
                       activation_bytes: int = 2,
                       tensors_per_block: int = 4) -> float:
    """Activation + parameter memory estimate in MB from real NHWC shapes.

    Same role as `GeometryAwareNetworkImpl::estimate_memory_mb`
    (`geometry_aware_network.h:339-360`), but computed from the actual
    pyramid: level l holds (H/2^l, W/2^l, f*2^l) activations in both the
    encoder and decoder, with ~``tensors_per_block`` live tensors per
    conv block (conv1/bn-relu/conv2/bn-relu), bf16 by default; params
    fp32 + fp32 Adam moments (x3). For the *real* number use
    :func:`compiled_memory_analysis` — XLA's own accounting.
    """
    act = 0.0
    for lvl in range(levels + 1):  # encoder levels + bottleneck
        h, w = height >> lvl, width >> lvl
        c = init_features << lvl
        act += batch_size * h * w * c
    for lvl in range(levels):      # decoder mirrors the encoder
        h, w = height >> lvl, width >> lvl
        c = init_features << lvl
        act += batch_size * h * w * c
    act_bytes = act * tensors_per_block * activation_bytes
    param_bytes = count_parameters(params) * 4 * 3  # params + 2 Adam moments
    return (act_bytes + param_bytes) / (1024.0 * 1024.0)


def compiled_memory_analysis(model, batch: Dict[str, jax.Array],
                             architecture: str) -> Dict[str, float]:
    """XLA's real memory accounting for a jitted forward (MB).

    Compiles the forward at the batch's shapes and reads
    ``compiled.memory_analysis()`` — the ground truth the estimate above
    approximates.
    """
    import jax.numpy as jnp

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           *model_inputs(architecture, batch)[0]))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    args, kwargs = model_inputs(architecture, batch)
    compiled = jax.jit(
        lambda v, *a: model.apply(v, *a, **kwargs)).lower(
            variables, *args).compile()
    mem = compiled.memory_analysis()
    if mem is None:
        return {}
    scale = 1.0 / (1024.0 * 1024.0)
    return {
        "argument_mb": mem.argument_size_in_bytes * scale,
        "output_mb": mem.output_size_in_bytes * scale,
        "temp_mb": mem.temp_size_in_bytes * scale,
        "total_mb": (mem.argument_size_in_bytes + mem.output_size_in_bytes
                     + mem.temp_size_in_bytes) * scale,
    }

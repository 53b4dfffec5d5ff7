"""U-Net building blocks (NHWC, flax.linen).

Parity target: `src/models/baseline_unet.h` blocks. Convs compute in
`dtype` (bf16 by default on TPU) with fp32 params; BatchNorm statistics
are always fp32 for stability. Under jit-SPMD data parallelism the
batch reductions inside BatchNorm are global (XLA inserts the
cross-replica collectives), which is the sync-BN behavior the reference
could not have (single device).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DoubleConv(nn.Module):
    """Conv3x3 -> BN -> ReLU -> Conv3x3 -> BN -> ReLU (`baseline_unet.h:14-44`)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            # BN statistics in fp32, activations stored in compute dtype —
            # the cast fuses into the BN kernel and halves HBM traffic.
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                             name=f"bn{i + 1}")(x).astype(self.dtype)
            x = nn.relu(x)
        return x


class EncoderBlock(nn.Module):
    """MaxPool2 -> DoubleConv (`baseline_unet.h:51-66`)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.features, self.dtype, name="conv")(x, train)


def maybe_remat(cls, static_argnums, enable, highres_block: bool = True):
    """Wrap a block class with gradient checkpointing when enabled.

    Remat trades recompute FLOPs for activation memory — required to fit
    the production 480x640 / init_features-96 geometry config in a v5e
    chip's 16GB HBM (measured 16.3GB without, OOM by ~550MB).

    ``enable`` accepts:
      * False — no remat;
      * True / "full" — remat every block;
      * "highres" — remat only blocks flagged ``highres_block`` (the two
        finest pyramid levels). In a U-Net each level costs ~equal
        recompute FLOPs (spatial/4 x channels^2*4 per level) but the
        finest levels hold the dominant share of activation bytes, so
        this recovers most of the memory for a fraction of the
        recompute tax (PERF_NOTES.md production-scale section).
    """
    if not enable:
        return cls
    if enable == "highres" and not highres_block:
        return cls
    if enable not in (True, "full", "highres"):
        raise ValueError(f"Unknown remat mode: {enable!r}")
    import flax.linen as nn_

    return nn_.remat(cls, static_argnums=static_argnums)


def pad_to_match(x, skip):
    """Zero-pad `x` spatially to the skip connection's H/W.

    Mirrors the decoder pad-fix for odd input sizes
    (`baseline_unet.h:88-95`): left/top gets diff//2, right/bottom the rest.
    """
    diff_h = skip.shape[1] - x.shape[1]
    diff_w = skip.shape[2] - x.shape[2]
    if diff_h > 0 or diff_w > 0:
        x = jnp.pad(
            x,
            ((0, 0),
             (max(diff_h // 2, 0), max(diff_h - diff_h // 2, 0)),
             (max(diff_w // 2, 0), max(diff_w - diff_w // 2, 0)),
             (0, 0)),
        )
    return x


class DecoderBlock(nn.Module):
    """ConvTranspose2(s2) -> pad-fix -> concat skip -> DoubleConv (`baseline_unet.h:73-104`)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up")(x)
        x = pad_to_match(x, skip)
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        return DoubleConv(self.features, self.dtype, name="conv")(x, train)

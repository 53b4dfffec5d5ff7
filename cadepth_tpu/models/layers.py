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
import jax
import jax.numpy as jnp


def apply_norm(x, kind: str, train: bool, name: str, out_dtype):
    """Per-block normalization, compute in fp32, output cast to ``out_dtype``.

    ``kind``:
      * "batch" — BatchNorm, the reference's choice everywhere
        (`baseline_unet.h:24,29`); statistics fp32, sync across replicas
        under jit-SPMD.
      * "group" — GroupNorm(32-or-fewer groups), an opt-in experiment:
        no batch statistics to accumulate, so the conv epilogue loses the
        fp32 sum/sum-sq outputs that ride every conv on the BN path
        (PERF_NOTES.md profiles ~64% of step time in conv+BN-statistic
        fusions) and no batch_stats state exists. Quality must be
        re-validated per config (scripts/convergence_demo.sh).
    """
    if kind == "batch":
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name=name)(x)
    elif kind == "group":
        # largest divisor of C that is <= 32 (GroupNorm requires
        # C % num_groups == 0; e.g. C=48 -> 16 groups, C=12 -> 12)
        ch = x.shape[-1]
        groups = next(g for g in range(min(32, ch), 0, -1) if ch % g == 0)
        x = nn.GroupNorm(num_groups=groups, dtype=jnp.float32,
                         name=name)(x)
    else:
        raise ValueError(f"Unknown norm kind: {kind!r}")
    return x.astype(out_dtype)


def upsample2x(x, features: int, mode: str, dtype, name: str):
    """2x decoder upsampling.

    ``mode``:
      * "transpose" — ConvTranspose 2x2 stride 2, reference parity
        (`baseline_unet.h:78`).
      * "resize" — nearest 2x resize + Conv3x3, an opt-in experiment:
        transpose convs lower to padded/strided convs on TPU and are a
        named cost in the 50%-of-peak ceiling analysis (PERF_NOTES.md);
        resize+conv puts the same FLOPs through a dense MXU-friendly
        conv instead. Changes parameters (3x3 vs 2x2 kernel) — not
        checkpoint-compatible with transpose mode.
    """
    if mode == "transpose":
        return nn.ConvTranspose(features, (2, 2), strides=(2, 2),
                                dtype=dtype, name=name)(x)
    if mode == "resize":
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(features, (3, 3), padding=1, dtype=dtype,
                       name=name)(x)
    raise ValueError(f"Unknown decoder_upsample mode: {mode!r}")


class DoubleConv(nn.Module):
    """Conv3x3 -> BN -> ReLU -> Conv3x3 -> BN -> ReLU (`baseline_unet.h:14-44`)."""

    features: int
    dtype: Any = jnp.bfloat16
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            # Norm statistics in fp32, activations stored in compute dtype —
            # the cast fuses into the norm kernel and halves HBM traffic.
            x = apply_norm(x, self.norm, train, f"bn{i + 1}", self.dtype)
            x = nn.relu(x)
        return x


class EncoderBlock(nn.Module):
    """MaxPool2 -> DoubleConv (`baseline_unet.h:51-66`)."""

    features: int
    dtype: Any = jnp.bfloat16
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.features, self.dtype, self.norm,
                          name="conv")(x, train)


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
    norm: str = "batch"
    upsample: str = "transpose"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = upsample2x(x, self.features, self.upsample, self.dtype, "up")
        x = pad_to_match(x, skip)
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        return DoubleConv(self.features, self.dtype, self.norm,
                          name="conv")(x, train)

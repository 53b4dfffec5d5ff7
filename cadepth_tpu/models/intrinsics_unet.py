"""Intrinsics-conditioned U-Nets (`src/models/intrinsics_unet.h`).

Same U-Net topology as the baseline but every block is a
FiLM-conditioned DoubleConv (FiLM applied between the two convs,
`intrinsics_unet.h:38-51`); the [fx, fy, cx, cy] vector is normalized
once per forward (`intrinsics_unet.h:252-268` via
:func:`cadepth_tpu.geometry.intrinsics.normalize_k4`) and fed to all 9
blocks. The attention variant adds CBAM after each decoder block
(`intrinsics_unet.h:278-385`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cadepth_tpu.geometry.intrinsics import normalize_k4
from cadepth_tpu.models.attention import CBAM
from cadepth_tpu.models.film import FiLMLayer
from cadepth_tpu.models.layers import (apply_norm, maybe_remat,
                                       pad_to_match, upsample2x)


class FiLMDoubleConv(nn.Module):
    """Conv -> BN -> ReLU -> FiLM -> Conv -> BN -> ReLU (`intrinsics_unet.h:16-53`)."""

    features: int
    dtype: Any = jnp.bfloat16
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, camera_params, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = apply_norm(x, self.norm, train, "bn1", self.dtype)
        x = nn.relu(x)
        x = FiLMLayer(self.features, dtype=self.dtype, name="film")(
            x, camera_params, train)
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = apply_norm(x, self.norm, train, "bn2", self.dtype)
        return nn.relu(x)


class FiLMEncoderBlock(nn.Module):
    """MaxPool2 -> FiLMDoubleConv (`intrinsics_unet.h:60-75`)."""

    features: int
    dtype: Any = jnp.bfloat16
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, camera_params, train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return FiLMDoubleConv(self.features, self.dtype, self.norm,
                              name="conv")(
            x, camera_params, train)


class FiLMDecoderBlock(nn.Module):
    """UpConv -> pad -> concat skip -> FiLMDoubleConv (`intrinsics_unet.h:82-113`)."""

    features: int
    dtype: Any = jnp.bfloat16
    norm: str = "batch"
    upsample: str = "transpose"

    @nn.compact
    def __call__(self, x, skip, camera_params, train: bool = False):
        x = upsample2x(x, self.features, self.upsample, self.dtype, "up")
        x = pad_to_match(x, skip)
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        return FiLMDoubleConv(self.features, self.dtype, self.norm,
                              name="conv")(
            x, camera_params, train)


class IntrinsicsConditionedUNet(nn.Module):
    """FiLM-everywhere U-Net (`intrinsics_unet.h:137-270`).

    Inputs: rgb (B, H, W, 3), camera_intrinsics (B, 4) = [fx, fy, cx, cy]
    in pixels (normalized internally).
    """

    in_channels: int = 3
    init_features: int = 64
    camera_dim: int = 4
    max_depth: float = 10.0
    remat: Any = False
    dtype: Any = jnp.bfloat16
    norm: str = "batch"
    decoder_upsample: str = "transpose"

    @nn.compact
    def __call__(self, rgb, camera_intrinsics, train: bool = False):
        f = self.init_features
        h, w = rgb.shape[1], rgb.shape[2]
        cam = normalize_k4(camera_intrinsics, width=w, height=h)
        x = rgb.astype(self.dtype)
        nm, up = self.norm, self.decoder_upsample
        DC = maybe_remat(FiLMDoubleConv, (3,), self.remat)
        Enc = maybe_remat(FiLMEncoderBlock, (3,), self.remat)
        Dec = maybe_remat(FiLMDecoderBlock, (4,), self.remat)
        EncLo = maybe_remat(FiLMEncoderBlock, (3,), self.remat,
                            highres_block=False)
        DecLo = maybe_remat(FiLMDecoderBlock, (4,), self.remat,
                            highres_block=False)

        skip1 = DC(f, self.dtype, nm, name="enc1")(x, cam, train)
        skip2 = Enc(f * 2, self.dtype, nm, name="enc2")(skip1, cam, train)
        skip3 = EncLo(f * 4, self.dtype, nm, name="enc3")(skip2, cam, train)
        skip4 = EncLo(f * 8, self.dtype, nm, name="enc4")(skip3, cam, train)

        x = EncLo(f * 16, self.dtype, nm,
                  name="bottleneck")(skip4, cam, train)

        x = DecLo(f * 8, self.dtype, nm, up, name="dec4")(x, skip4, cam, train)
        x = DecLo(f * 4, self.dtype, nm, up, name="dec3")(x, skip3, cam, train)
        x = Dec(f * 2, self.dtype, nm, up, name="dec2")(x, skip2, cam, train)
        x = Dec(f, self.dtype, nm, up, name="dec1")(x, skip1, cam, train)

        x = nn.Conv(1, (1, 1), dtype=jnp.float32, name="out_conv")(
            x.astype(jnp.float32))
        return nn.sigmoid(x) * self.max_depth


class IntrinsicsAttentionUNet(nn.Module):
    """IntrinsicsConditionedUNet + CBAM after each decoder (`intrinsics_unet.h:278-385`)."""

    in_channels: int = 3
    init_features: int = 64
    camera_dim: int = 4
    max_depth: float = 10.0
    remat: Any = False
    dtype: Any = jnp.bfloat16
    norm: str = "batch"
    decoder_upsample: str = "transpose"
    sa_lowering: str = "toeplitz"

    @nn.compact
    def __call__(self, rgb, camera_intrinsics, train: bool = False):
        f = self.init_features
        h, w = rgb.shape[1], rgb.shape[2]
        cam = normalize_k4(camera_intrinsics, width=w, height=h)
        x = rgb.astype(self.dtype)
        nm, up = self.norm, self.decoder_upsample
        sal = self.sa_lowering
        DC = maybe_remat(FiLMDoubleConv, (3,), self.remat)
        Enc = maybe_remat(FiLMEncoderBlock, (3,), self.remat)
        Dec = maybe_remat(FiLMDecoderBlock, (4,), self.remat)
        EncLo = maybe_remat(FiLMEncoderBlock, (3,), self.remat,
                            highres_block=False)
        DecLo = maybe_remat(FiLMDecoderBlock, (4,), self.remat,
                            highres_block=False)

        skip1 = DC(f, self.dtype, nm, name="enc1")(x, cam, train)
        skip2 = Enc(f * 2, self.dtype, nm, name="enc2")(skip1, cam, train)
        skip3 = EncLo(f * 4, self.dtype, nm, name="enc3")(skip2, cam, train)
        skip4 = EncLo(f * 8, self.dtype, nm, name="enc4")(skip3, cam, train)

        x = EncLo(f * 16, self.dtype, nm,
                  name="bottleneck")(skip4, cam, train)

        x = DecLo(f * 8, self.dtype, nm, up, name="dec4")(x, skip4, cam, train)
        x = CBAM(f * 8, dtype=self.dtype, sa_lowering=sal, name="att4")(x)
        x = DecLo(f * 4, self.dtype, nm, up, name="dec3")(x, skip3, cam, train)
        x = CBAM(f * 4, dtype=self.dtype, sa_lowering=sal, name="att3")(x)
        x = Dec(f * 2, self.dtype, nm, up, name="dec2")(x, skip2, cam, train)
        x = CBAM(f * 2, dtype=self.dtype, sa_lowering=sal, name="att2")(x)
        x = Dec(f, self.dtype, nm, up, name="dec1")(x, skip1, cam, train)
        x = CBAM(f, dtype=self.dtype, sa_lowering=sal, name="att1")(x)

        x = nn.Conv(1, (1, 1), dtype=jnp.float32, name="out_conv")(
            x.astype(jnp.float32))
        return nn.sigmoid(x) * self.max_depth

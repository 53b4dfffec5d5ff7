"""Geometry-aware depth networks (`src/models/geometry_aware_network.h`).

The flagship model family: ray-direction input channels, FiLM
conditioning everywhere, Perspective Correction Layers in the decoder,
and CBAM attention. Full variant is 5 encoder levels to a 32f
bottleneck (`geometry_aware_network.h:201-394`); the lightweight variant
is 4 levels at 32 features (`:402-473`).

Rays are avg-pooled per decoder scale (factors 16/8/4/2/1 for the full
variant, `geometry_aware_network.h:310-316`) on device.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cadepth_tpu.geometry.intrinsics import normalize_k4
from cadepth_tpu.models.attention import CBAM
from cadepth_tpu.models.film import FiLMLayer
from cadepth_tpu.models.layers import (apply_norm, maybe_remat,
                                       pad_to_match, upsample2x)
from cadepth_tpu.models.pcl import PerspectiveCorrectionLayer
from cadepth_tpu.ops.resize import avg_pool2d


class RayEnhancedConv(nn.Module):
    """Conv block with optional ray-channel concat + FiLM
    (`geometry_aware_network.h:17-67`): [x; rays] -> conv-BN-ReLU ->
    FiLM -> conv-BN-ReLU."""

    features: int
    dtype: Any = jnp.bfloat16
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, camera_params,
                 ray_directions: Optional[jax.Array] = None,
                 train: bool = False):
        if ray_directions is not None:
            x = jnp.concatenate(
                [x, ray_directions.astype(x.dtype)], axis=-1)
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


class GeometryEncoderBlock(nn.Module):
    """MaxPool -> RayEnhancedConv -> optional CBAM (`geometry_aware_network.h:74-105`)."""

    features: int
    use_attention: bool = True
    dtype: Any = jnp.bfloat16
    norm: str = "batch"
    sa_lowering: str = "toeplitz"

    @nn.compact
    def __call__(self, x, camera_params,
                 ray_directions: Optional[jax.Array] = None,
                 train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = RayEnhancedConv(self.features, self.dtype, self.norm,
                            name="conv")(
            x, camera_params, ray_directions, train)
        if self.use_attention:
            x = CBAM(self.features, dtype=self.dtype,
                     sa_lowering=self.sa_lowering, name="attention")(x)
        return x


class GeometryDecoderBlock(nn.Module):
    """UpConv -> PCL -> pad -> concat skip -> RayEnhancedConv -> CBAM
    (`geometry_aware_network.h:112-170`). PCL sees the upsampled features
    and the scale-matched rays."""

    features: int
    use_pcl: bool = True
    use_attention: bool = True
    dtype: Any = jnp.bfloat16
    pcl_warp: str = "two_pass"
    norm: str = "batch"
    upsample: str = "transpose"
    sa_lowering: str = "toeplitz"

    @nn.compact
    def __call__(self, x, skip, camera_params,
                 ray_directions: Optional[jax.Array] = None,
                 train: bool = False):
        x = upsample2x(x, self.features, self.upsample, self.dtype, "up")
        if self.use_pcl:
            x = PerspectiveCorrectionLayer(
                self.features, warp_mode=self.pcl_warp, dtype=self.dtype,
                name="pcl")(x, camera_params, ray_directions, train)
        x = pad_to_match(x, skip)
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        x = RayEnhancedConv(self.features, self.dtype, self.norm,
                            name="conv")(
            x, camera_params, None, train)
        if self.use_attention:
            x = CBAM(self.features, dtype=self.dtype,
                     sa_lowering=self.sa_lowering, name="attention")(x)
        return x


class GeometryAwareNetwork(nn.Module):
    """Full 5-level geometry-aware network (`geometry_aware_network.h:201-394`).

    Inputs: rgb (B, H, W, 3), ray_directions (B, H, W, 3),
    camera_intrinsics (B, 4) in pixels. H and W must be divisible by 32.
    """

    in_channels: int = 3
    init_features: int = 64
    camera_dim: int = 4
    max_depth: float = 10.0
    use_pcl: bool = True
    use_attention: bool = True
    # False | True/"full" | "highres" (models/layers.py: maybe_remat)
    remat: Any = False
    dtype: Any = jnp.bfloat16
    # PCL warp backend: "two_pass" | "auto" | "gather" | "separable"
    # (models/pcl.py — two_pass is the TPU default, see its docstring)
    pcl_warp: str = "two_pass"
    # "batch" | "group" and "transpose" | "resize" (models/layers.py)
    norm: str = "batch"
    decoder_upsample: str = "transpose"
    # spatial-attention conv lowering: "toeplitz" | "stencil" | "conv"
    # (models/attention.py SpatialGateConv)
    sa_lowering: str = "toeplitz"

    @nn.compact
    def __call__(self, rgb, ray_directions, camera_intrinsics,
                 train: bool = False):
        f = self.init_features
        h, w = rgb.shape[1], rgb.shape[2]
        cam = normalize_k4(camera_intrinsics, width=w, height=h)
        x = rgb.astype(self.dtype)
        rays = ray_directions
        nm, up = self.norm, self.decoder_upsample
        sal = self.sa_lowering

        RayConv = maybe_remat(RayEnhancedConv, (4,), self.remat)
        Enc = maybe_remat(GeometryEncoderBlock, (4,), self.remat)
        Dec = maybe_remat(GeometryDecoderBlock, (5,), self.remat)
        EncLo = maybe_remat(GeometryEncoderBlock, (4,), self.remat,
                            highres_block=False)
        DecLo = maybe_remat(GeometryDecoderBlock, (5,), self.remat,
                            highres_block=False)

        skip1 = RayConv(f, self.dtype, nm, name="enc1")(x, cam, rays, train)
        skip2 = Enc(f * 2, self.use_attention, self.dtype, nm, sal,
                    name="enc2")(skip1, cam, None, train)
        skip3 = EncLo(f * 4, self.use_attention, self.dtype, nm, sal,
                      name="enc3")(skip2, cam, None, train)
        skip4 = EncLo(f * 8, self.use_attention, self.dtype, nm, sal,
                      name="enc4")(skip3, cam, None, train)
        skip5 = EncLo(f * 16, self.use_attention, self.dtype, nm, sal,
                      name="enc5")(skip4, cam, None, train)

        x = EncLo(f * 32, self.use_attention, self.dtype, nm, sal,
                  name="bottleneck")(skip5, cam, None, train)

        # Decoder rays at factors 16/8/4/2/1 (`geometry_aware_network.h:310-316`).
        dec_kw = dict(pcl_warp=self.pcl_warp, norm=nm, upsample=up,
                      sa_lowering=sal)
        x = DecLo(f * 16, self.use_pcl, self.use_attention,
                  self.dtype, name="dec5", **dec_kw)(
            x, skip5, cam, avg_pool2d(rays, 16), train)
        x = DecLo(f * 8, self.use_pcl, self.use_attention,
                  self.dtype, name="dec4", **dec_kw)(
            x, skip4, cam, avg_pool2d(rays, 8), train)
        x = DecLo(f * 4, self.use_pcl, self.use_attention,
                  self.dtype, name="dec3", **dec_kw)(
            x, skip3, cam, avg_pool2d(rays, 4), train)
        x = Dec(f * 2, self.use_pcl, self.use_attention,
                self.dtype, name="dec2", **dec_kw)(
            x, skip2, cam, avg_pool2d(rays, 2), train)
        x = Dec(f, self.use_pcl, self.use_attention,
                self.dtype, name="dec1", **dec_kw)(
            x, skip1, cam, rays, train)

        x = nn.Conv(1, (1, 1), dtype=jnp.float32, name="out_conv")(
            x.astype(jnp.float32))
        return nn.sigmoid(x) * self.max_depth


class LightweightGeometryNetwork(nn.Module):
    """4-level, 32-feature variant (`geometry_aware_network.h:402-473`).

    Decoder rays at factors 8/4/2/1. H and W must be divisible by 16.
    """

    in_channels: int = 3
    init_features: int = 32
    camera_dim: int = 4
    max_depth: float = 10.0
    remat: Any = False
    dtype: Any = jnp.bfloat16
    pcl_warp: str = "two_pass"
    norm: str = "batch"
    decoder_upsample: str = "transpose"
    sa_lowering: str = "toeplitz"

    @nn.compact
    def __call__(self, rgb, ray_directions, camera_intrinsics,
                 train: bool = False):
        f = self.init_features
        h, w = rgb.shape[1], rgb.shape[2]
        cam = normalize_k4(camera_intrinsics, width=w, height=h)
        x = rgb.astype(self.dtype)
        rays = ray_directions
        nm, up = self.norm, self.decoder_upsample
        sal = self.sa_lowering
        RayConv = maybe_remat(RayEnhancedConv, (4,), self.remat)
        Enc = maybe_remat(GeometryEncoderBlock, (4,), self.remat)
        Dec = maybe_remat(GeometryDecoderBlock, (5,), self.remat)
        EncLo = maybe_remat(GeometryEncoderBlock, (4,), self.remat,
                            highres_block=False)
        DecLo = maybe_remat(GeometryDecoderBlock, (5,), self.remat,
                            highres_block=False)

        skip1 = RayConv(f, self.dtype, nm, name="enc1")(x, cam, rays, train)
        skip2 = Enc(f * 2, True, self.dtype, nm, sal, name="enc2")(
            skip1, cam, None, train)
        skip3 = EncLo(f * 4, True, self.dtype, nm, sal, name="enc3")(
            skip2, cam, None, train)
        skip4 = EncLo(f * 8, True, self.dtype, nm, sal, name="enc4")(
            skip3, cam, None, train)

        x = EncLo(f * 16, True, self.dtype, nm, sal, name="bottleneck")(
            skip4, cam, None, train)

        dec_kw = dict(pcl_warp=self.pcl_warp, norm=nm, upsample=up,
                      sa_lowering=sal)
        x = DecLo(f * 8, True, True, self.dtype, name="dec4", **dec_kw)(
            x, skip4, cam, avg_pool2d(rays, 8), train)
        x = DecLo(f * 4, True, True, self.dtype, name="dec3", **dec_kw)(
            x, skip3, cam, avg_pool2d(rays, 4), train)
        x = Dec(f * 2, True, True, self.dtype, name="dec2", **dec_kw)(
            x, skip2, cam, avg_pool2d(rays, 2), train)
        x = Dec(f, True, True, self.dtype, name="dec1", **dec_kw)(
            x, skip1, cam, rays, train)

        x = nn.Conv(1, (1, 1), dtype=jnp.float32, name="out_conv")(
            x.astype(jnp.float32))
        return nn.sigmoid(x) * self.max_depth

"""CBAM and camera-aware attention modules (`src/layers/spatial_attention.h`).

All modules are NHWC. Channel pooling becomes axis reductions; the
"adaptive pool to 1x1" of the reference is a mean/max over (H, W).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ChannelAttention(nn.Module):
    """σ(MLP(avgpool) + MLP(maxpool)) channel gate (`spatial_attention.h:23-76`)."""

    channels: int
    reduction_ratio: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        reduced = max(self.channels // self.reduction_ratio, 1)
        fc1 = nn.Dense(reduced, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.channels, dtype=self.dtype, name="fc2")
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        att = nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))
        return att[:, None, None, :]  # (B, 1, 1, C)


class SpatialAttention(nn.Module):
    """σ(conv7x7([avg; max] over C)) spatial gate (`spatial_attention.h:92-126`)."""

    kernel_size: int = 7
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        concat = jnp.concatenate([avg, mx], axis=-1)
        att = nn.Conv(1, (self.kernel_size, self.kernel_size),
                      padding=self.kernel_size // 2, use_bias=False,
                      dtype=self.dtype, name="conv")(concat)
        return nn.sigmoid(att)  # (B, H, W, 1)


class CBAM(nn.Module):
    """Channel then spatial attention in sequence (`spatial_attention.h:142-191`)."""

    channels: int
    reduction_ratio: int = 16
    spatial_kernel: int = 7
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.channel_attention = ChannelAttention(
            self.channels, self.reduction_ratio, self.dtype)
        self.spatial_attention = SpatialAttention(self.spatial_kernel, self.dtype)

    def __call__(self, x):
        x = x * self.channel_attention(x)
        x = x * self.spatial_attention(x)
        return x

    def get_attention_maps(self, x) -> Tuple[jax.Array, jax.Array]:
        """(channel_att, spatial_att) for visualization (`spatial_attention.h:183-189`)."""
        channel_att = self.channel_attention(x)
        spatial_att = self.spatial_attention(x * channel_att)
        return channel_att, spatial_att


class DepthSpatialAttention(nn.Module):
    """Edge + dilated-context + base attention fusion (`spatial_attention.h:208-261`)."""

    channels: int
    kernel_size: int = 7
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        base = SpatialAttention(self.kernel_size, self.dtype, name="base_attention")(x)
        edge = nn.sigmoid(nn.Conv(1, (3, 3), padding=1, use_bias=False,
                                  dtype=self.dtype, name="edge_conv")(x))
        context = nn.sigmoid(nn.Conv(
            1, (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2 * 2,  # dilation-2 "same" padding
            kernel_dilation=(2, 2), use_bias=False,
            dtype=self.dtype, name="context_conv")(x))
        fused = jnp.concatenate([base, edge, context], axis=-1)
        att = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                      name="fusion_conv")(fused)
        return nn.sigmoid(att)


class CameraAwareSpatialAttention(nn.Module):
    """Spatial attention conditioned on intrinsics (`spatial_attention.h:272-330`).

    A camera embedding is broadcast over (H, W) and fused with pooled
    spatial features by a 1x1 conv.
    """

    channels: int
    camera_dim: int = 4
    kernel_size: int = 7
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, camera_params):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        pooled = jnp.concatenate([avg, mx], axis=-1)
        spatial = nn.Conv(self.channels, (self.kernel_size, self.kernel_size),
                          padding=self.kernel_size // 2, use_bias=False,
                          dtype=self.dtype, name="spatial_conv")(pooled)
        cam = nn.relu(nn.Dense(self.channels, dtype=self.dtype,
                               name="camera_fc")(camera_params.astype(self.dtype)))
        cam = jnp.broadcast_to(cam[:, None, None, :],
                               spatial.shape[:3] + (self.channels,))
        fused = jnp.concatenate([spatial, cam], axis=-1)
        att = nn.Conv(1, (1, 1), dtype=self.dtype, name="fusion_conv")(fused)
        return nn.sigmoid(att)

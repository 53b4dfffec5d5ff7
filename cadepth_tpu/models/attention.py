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


SA_LOWERINGS = ("conv", "stencil", "toeplitz")


class SpatialGateConv(nn.Module):
    """KxK conv over the 2-channel [avg; max] map with TPU-friendly lowerings.

    The reference's spatial-attention conv (`spatial_attention.h:92-126`)
    has C_in=2 / C_out=1: XLA's TPU conv emitter fills 1/128 MXU output
    lanes and runs ~240 MFLOP at <0.1% of peak (~5.5 ms fwd+bwd in the
    flagship step — PERF_NOTES "CBAM cost decomposition"). All lowerings
    compute the identical convolution with the identical parameter
    (module path ``conv/kernel``, shape (K, K, 2, 1), lecun-normal init —
    checkpoint-interchangeable with ``nn.Conv``):

    - ``conv``:     direct ``lax.conv`` (reference-style lowering)
    - ``stencil``:  explicit 2*K*K-tap shifted-slice FMA — one elementwise
                    VPU fusion, no conv emitter
    - ``toeplitz``: width-in-lanes GEMM — the K vertical shifts of both
                    channels stack into the contraction dim and multiply a
                    block-Toeplitz (2K*Wp, W) matrix built from the filter
                    via a one-hot iota basis (the affine-warp trick,
                    `ops/affine_warp.py`). Measured fastest at every CBAM
                    site: finest-level fwd+grad 5.3 ms vs conv's 9.6
                    (scripts/probe_sa_lowering.py, 2026-08-18).

    Numerics differ from ``conv`` only by summation order (bf16 rel err
    ~4e-3, f32 ~1e-6).
    """

    kernel_size: int = 7
    lowering: str = "toeplitz"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, p):
        k = self.kernel_size
        if k % 2 != 1:
            raise ValueError(
                f"SpatialGateConv requires an odd kernel_size (got {k}): "
                "with pad=k//2 the lowerings only agree on 'same' output "
                "shapes for odd kernels")
        pad = k // 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, 2, 1), jnp.float32)
        w = kernel.astype(self.dtype)
        p = p.astype(self.dtype)
        if self.lowering == "conv":
            return jax.lax.conv_general_dilated(
                p, w, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.lowering not in SA_LOWERINGS:
            raise ValueError(
                f"spatial-attention lowering '{self.lowering}' not in "
                f"{SA_LOWERINGS}")
        _, h, width, _ = p.shape
        pp = jnp.pad(p, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        if self.lowering == "stencil":
            att = jnp.zeros(p.shape[:3], self.dtype)
            for dy in range(k):
                for dx in range(k):
                    sl = pp[:, dy:dy + h, dx:dx + width, :]
                    att = att + sl[..., 0] * w[dy, dx, 0, 0] \
                              + sl[..., 1] * w[dy, dx, 1, 0]
            return att[..., None]
        # toeplitz
        wp = width + 2 * pad
        kx_i = jax.lax.broadcasted_iota(jnp.int32, (k, wp, width), 0)
        wp_i = jax.lax.broadcasted_iota(jnp.int32, (k, wp, width), 1)
        wo_i = jax.lax.broadcasted_iota(jnp.int32, (k, wp, width), 2)
        basis = (wp_i == wo_i + kx_i).astype(self.dtype)
        # K vertical shifts of both channels -> contraction axis
        rows = jnp.stack(
            [pp[:, ky:ky + h, :, c] for ky in range(k) for c in range(2)],
            axis=2)  # (B, H, 2K, Wp)
        t = jnp.einsum("kxc,xpw->kcpw", w[..., 0], basis).reshape(
            2 * k, wp, width)
        att = jnp.einsum("bhsp,spw->bhw", rows, t)
        return att[..., None]


class SpatialAttention(nn.Module):
    """σ(conv7x7([avg; max] over C)) spatial gate (`spatial_attention.h:92-126`).

    ``lowering`` picks the TPU lowering of the degenerate 2->1-channel
    conv (see :class:`SpatialGateConv`); all lowerings share the same
    parameter tree and math.
    """

    kernel_size: int = 7
    dtype: Any = jnp.bfloat16
    lowering: str = "toeplitz"

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        concat = jnp.concatenate([avg, mx], axis=-1)
        att = SpatialGateConv(self.kernel_size, self.lowering,
                              self.dtype, name="conv")(concat)
        return nn.sigmoid(att)  # (B, H, W, 1)


class CBAM(nn.Module):
    """Channel then spatial attention in sequence (`spatial_attention.h:142-191`)."""

    channels: int
    reduction_ratio: int = 16
    spatial_kernel: int = 7
    dtype: Any = jnp.bfloat16
    sa_lowering: str = "toeplitz"

    def setup(self):
        self.channel_attention = ChannelAttention(
            self.channels, self.reduction_ratio, self.dtype)
        self.spatial_attention = SpatialAttention(
            self.spatial_kernel, self.dtype, self.sa_lowering)

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
    sa_lowering: str = "toeplitz"

    @nn.compact
    def __call__(self, x):
        base = SpatialAttention(self.kernel_size, self.dtype,
                                self.sa_lowering, name="base_attention")(x)
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

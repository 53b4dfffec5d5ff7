"""FiLM conditioning on camera parameters (`src/layers/film_layer.h`).

FiLM(F; γ, β) = γ ⊙ F + β, with γ/β produced by an MLP over the
normalized [fx, fy, cx, cy] vector. The γ head is initialized to ~1 and
β to ~0 so training starts from the identity transform
(`film_layer.h:67-71`).

The reference's data-dependent "BatchNorm1d only when B > 1" branch
(`film_layer.h:85-93`) is resolved at trace time: batch size is static
under jit, so the branch is a Python conditional. The BN modules are
still *created* (called) at B == 1 so the parameter tree is identical
for any batch size; their output is simply unused there.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FiLMLayer(nn.Module):
    """Camera-conditioned feature modulation (`film_layer.h:26-132`)."""

    feature_channels: int
    hidden_dim: int = 256
    use_batch_norm: bool = True
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.fc1 = nn.Dense(128, dtype=jnp.float32)
        self.fc2 = nn.Dense(self.hidden_dim, dtype=jnp.float32)
        if self.use_batch_norm:
            self.bn1 = nn.BatchNorm(dtype=jnp.float32)
            self.bn2 = nn.BatchNorm(dtype=jnp.float32)
        self.fc_gamma = nn.Dense(
            self.feature_channels,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.ones,
            dtype=jnp.float32,
        )
        self.fc_beta = nn.Dense(
            self.feature_channels,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
        )

    def _embed(self, camera_params, train: bool):
        h = self.fc1(camera_params.astype(jnp.float32))
        if self.use_batch_norm:
            h_bn = self.bn1(h, use_running_average=not train or h.shape[0] == 1)
            if h.shape[0] > 1:
                h = h_bn
        h = nn.relu(h)
        h = self.fc2(h)
        if self.use_batch_norm:
            h_bn = self.bn2(h, use_running_average=not train or h.shape[0] == 1)
            if h.shape[0] > 1:
                h = h_bn
        h = nn.relu(h)
        return self.fc_gamma(h), self.fc_beta(h)

    def __call__(self, features, camera_params, train: bool = False):
        """features (B, H, W, C), camera_params (B, camera_dim) -> (B, H, W, C)."""
        gamma, beta = self._embed(camera_params, train)
        gamma = gamma[:, None, None, :].astype(features.dtype)
        beta = beta[:, None, None, :].astype(features.dtype)
        return gamma * features + beta

    def get_modulation_params(self, camera_params,
                              train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """(γ, β) for analysis (`film_layer.h:115-130`)."""
        return self._embed(camera_params, train)


class FiLMConvBlock(nn.Module):
    """Conv -> BN -> FiLM -> ReLU (`film_layer.h:140-169`)."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, camera_params, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="bn")(x).astype(self.dtype)
        x = FiLMLayer(self.features, dtype=self.dtype, name="film")(
            x, camera_params, train)
        return nn.relu(x)

"""Baseline U-Net for depth (`src/models/baseline_unet.h:122-208`).

RGB (B, H, W, 3) -> depth (B, H, W, 1) in [0, max_depth] via
sigmoid * max_depth. 4-level encoder (f..8f) + bottleneck (16f) +
4-level decoder with skip connections.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cadepth_tpu.models.layers import (
    DoubleConv,
    DecoderBlock,
    EncoderBlock,
    maybe_remat,
)


class BaselineUNet(nn.Module):
    in_channels: int = 3
    init_features: int = 64
    max_depth: float = 10.0
    # False | True/"full" | "highres" (see models/layers.py: maybe_remat)
    remat: Any = False
    dtype: Any = jnp.bfloat16
    # "batch" (reference parity) | "group" — see layers.apply_norm
    norm: str = "batch"
    # "transpose" (reference parity) | "resize" — see layers.upsample2x
    decoder_upsample: str = "transpose"

    @nn.compact
    def __call__(self, rgb, train: bool = False):
        f = self.init_features
        x = rgb.astype(self.dtype)
        DC = maybe_remat(DoubleConv, (2,), self.remat)
        Enc = maybe_remat(EncoderBlock, (2,), self.remat)
        Dec = maybe_remat(DecoderBlock, (3,), self.remat)
        # coarse levels: only rematted in "full" mode
        EncLo = maybe_remat(EncoderBlock, (2,), self.remat, highres_block=False)
        DecLo = maybe_remat(DecoderBlock, (3,), self.remat, highres_block=False)
        nm, up = self.norm, self.decoder_upsample

        skip1 = DC(f, self.dtype, nm, name="enc1")(x, train)
        skip2 = Enc(f * 2, self.dtype, nm, name="enc2")(skip1, train)
        skip3 = EncLo(f * 4, self.dtype, nm, name="enc3")(skip2, train)
        skip4 = EncLo(f * 8, self.dtype, nm, name="enc4")(skip3, train)

        x = EncLo(f * 16, self.dtype, nm, name="bottleneck")(skip4, train)

        x = DecLo(f * 8, self.dtype, nm, up, name="dec4")(x, skip4, train)
        x = DecLo(f * 4, self.dtype, nm, up, name="dec3")(x, skip3, train)
        x = Dec(f * 2, self.dtype, nm, up, name="dec2")(x, skip2, train)
        x = Dec(f, self.dtype, nm, up, name="dec1")(x, skip1, train)

        x = nn.Conv(1, (1, 1), dtype=jnp.float32, name="out_conv")(
            x.astype(jnp.float32))
        return nn.sigmoid(x) * self.max_depth

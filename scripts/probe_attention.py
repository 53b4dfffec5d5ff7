#!/usr/bin/env python
"""On-chip decomposition of the CBAM attention cost (round 4).

The coarse ablation (`/tmp/ablate_bench.json`) measured the flagship
geometry step at 134.9 img/s with CBAM vs 151.7 without, and the
channel/spatial split showed SPATIAL attention carries ~12.4 of the
~16.8 img/s tax (`/tmp/cbam_decomp.json`).  This probe swaps
`SpatialAttention` / `ChannelAttention` for cost-isolating variants
(CBAM resolves the names from the attention module's globals at setup
time) to find where the ~10 ms/step goes:

  full        shipped CBAM (baseline)
  sa_off      spatial gate = 1        (upper bound: all spatial cost)
  sa_meanmean concat [avg, avg]       (drops the channel-max + its VJP)
  sa_1x1      1x1 conv instead of 7x7 (isolates the small-channel conv)
  sa_sg       stop_gradient(gate)     (isolates backward-through-gate)
  ca_off      channel gate = 1        (upper bound: all channel cost)

Usage: python scripts/probe_attention.py [out.json]
Model: geometry_aware f64 b16 240x320, pcl_warp=two_pass (the flagship
bench setting, `scripts/bench_r3.py`).
"""

from __future__ import annotations

import json
import sys
from typing import Any

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from cadepth_tpu.models import attention as att_mod
    from scripts.bench_r3 import bench

    OrigSA = att_mod.SpatialAttention
    OrigCA = att_mod.ChannelAttention

    class SAOff(nn.Module):
        kernel_size: int = 7
        dtype: Any = jnp.bfloat16
        lowering: str = "toeplitz"

        @nn.compact
        def __call__(self, x):
            return jnp.ones(x.shape[:3] + (1,), x.dtype)

    class SAMeanMean(nn.Module):
        kernel_size: int = 7
        dtype: Any = jnp.bfloat16
        lowering: str = "toeplitz"

        @nn.compact
        def __call__(self, x):
            avg = jnp.mean(x, axis=-1, keepdims=True)
            concat = jnp.concatenate([avg, avg], axis=-1)
            att = nn.Conv(1, (self.kernel_size, self.kernel_size),
                          padding=self.kernel_size // 2, use_bias=False,
                          dtype=self.dtype, name="conv")(concat)
            return nn.sigmoid(att)

    class SA1x1(nn.Module):
        kernel_size: int = 7
        dtype: Any = jnp.bfloat16
        lowering: str = "toeplitz"

        @nn.compact
        def __call__(self, x):
            avg = jnp.mean(x, axis=-1, keepdims=True)
            mx = jnp.max(x, axis=-1, keepdims=True)
            concat = jnp.concatenate([avg, mx], axis=-1)
            att = nn.Conv(1, (1, 1), use_bias=False,
                          dtype=self.dtype, name="conv")(concat)
            return nn.sigmoid(att)

    class SASg(nn.Module):
        kernel_size: int = 7
        dtype: Any = jnp.bfloat16
        lowering: str = "toeplitz"

        @nn.compact
        def __call__(self, x):
            gate = OrigSA(self.kernel_size, self.dtype, name="inner")(x)
            return jax.lax.stop_gradient(gate)

    class CAOff(nn.Module):
        channels: int
        reduction_ratio: int = 16
        dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            return jnp.ones((x.shape[0], 1, 1, x.shape[-1]), x.dtype)

    variants = [
        ("full", OrigSA, OrigCA),
        ("sa_off", SAOff, OrigCA),
        ("sa_meanmean", SAMeanMean, OrigCA),
        ("sa_1x1", SA1x1, OrigCA),
        ("sa_sg", SASg, OrigCA),
        ("ca_off", OrigSA, CAOff),
    ]
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/att_probe.json"
    results = {}
    for name, sa, ca in variants:
        att_mod.SpatialAttention = sa
        att_mod.ChannelAttention = ca
        try:
            r = bench("geometry_aware", 16, 240, 320, steps=10,
                      pcl_warp="two_pass")
        except Exception as exc:  # noqa: BLE001 - record and continue
            r = {"error": repr(exc)[:300]}
        print(name, r, flush=True)
        results[name] = r
        json.dump(results, open(out_path, "w"), indent=2)
    att_mod.SpatialAttention = OrigSA
    att_mod.ChannelAttention = OrigCA


if __name__ == "__main__":
    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    main()

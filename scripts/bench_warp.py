#!/usr/bin/env python
"""Microbenchmark the PCL warp backends at the geometry model's level shapes.

Times forward+backward of each warp (gather / two_pass / separable) at
the five decoder-level feature shapes of GeometryAwareNetwork f64 on the
current default device. Used to produce the PERF_NOTES.md warp tables.

Usage: python scripts/bench_warp.py [--batch 16] [--height 240] [--width 320]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from cadepth_tpu.ops.affine_warp import (
        separable_affine_warp,
        two_pass_affine_warp,
    )
    from cadepth_tpu.ops.grid_sample import affine_grid, grid_sample

    dtype = jnp.dtype(args.dtype)

    def warp_gather(feats, th):
        g = affine_grid(th, feats.shape[1], feats.shape[2],
                        align_corners=False)
        return grid_sample(feats, g, padding_mode="zeros",
                           align_corners=False)

    def warp_two_pass(feats, th):
        return two_pass_affine_warp(feats, th)

    def warp_separable(feats, th):
        return separable_affine_warp(feats, th)

    backends = {"gather": warp_gather, "two_pass": warp_two_pass,
                "separable": warp_separable}

    # decoder levels of GeometryAwareNetwork f64 (coarsest -> finest):
    # PCL runs on the upsampled features BEFORE skip concat
    levels = []
    for lvl in range(5):
        h = args.height >> lvl
        w = args.width >> lvl
        c = args.features << lvl
        levels.append((h, w, c))
    levels = levels[::-1]

    rng = np.random.default_rng(0)
    theta_np = np.zeros((args.batch, 2, 3), np.float32)
    theta_np[:, 0, 0] = 1.02
    theta_np[:, 1, 1] = 0.98
    theta_np[:, 0, 2] = 0.05
    theta_np[:, 1, 2] = -0.03
    theta = jnp.asarray(theta_np)

    print(f"device={jax.devices()[0].platform} batch={args.batch} "
          f"dtype={args.dtype} steps={args.steps}")
    print(f"{'level (HxWxC)':>18} | " + " | ".join(
        f"{k:>10}" for k in backends))

    total = {k: 0.0 for k in backends}
    for (h, w, c) in levels:
        img = jnp.asarray(
            rng.normal(size=(args.batch, h, w, c)).astype(np.float32)
        ).astype(dtype)
        row = []
        for name, fn in backends.items():
            def loss(x, t):
                return jnp.sum(fn(x, t).astype(jnp.float32) ** 2)

            step = jax.jit(jax.grad(loss, argnums=(0, 1)))
            gx, gt = step(img, theta)
            jax.block_until_ready(gx)
            float(np.asarray(gt).ravel()[0])  # hard sync
            t0 = time.perf_counter()
            for _ in range(args.steps):
                gx, gt = step(img, theta)
            jax.block_until_ready(gx)
            float(np.asarray(gt).ravel()[0])
            ms = (time.perf_counter() - t0) / args.steps * 1e3
            total[name] += ms
            row.append(f"{ms:8.2f}ms")
        print(f"{h:>5}x{w}x{c:<6} | " + " | ".join(f"{r:>10}" for r in row))
    print(f"{'TOTAL':>18} | " + " | ".join(
        f"{total[k]:8.2f}ms" for k in backends))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

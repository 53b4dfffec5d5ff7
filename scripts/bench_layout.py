#!/usr/bin/env python
"""Layout-copy-tax experiments on the two-pass warp (VERDICT r2 item 1).

The b16 geometry train step spends ~20% (24 ms, 6.1 GB) in XLA
operand-relayout copies around the warp einsums (PERF_NOTES.md). This
harness measures copy bytes + step time for the standalone warp and the
full geometry step under candidate mitigations:

  base       — ops/affine_warp.py as shipped
  layoutpin  — jax.experimental.layout.with_layout_constraint pinning
               the pass operands/outputs to the dot's preferred layout
  fuseT      — alternative einsum index orders that keep the activation
               in NHWC (no explicit swapaxes; let dot_general batch on
               non-leading dims)

Usage: python scripts/bench_layout.py [warp|model] [variants...]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from cadepth_tpu.ops.affine_warp import (
    _build_mh,
    _build_mv,
    two_pass_affine_warp,
)
from cadepth_tpu.utils import enable_compilation_cache


def copy_stats(compiled) -> dict:
    """Total bytes moved by `copy`/`transpose` ops in the optimized HLO."""
    import re

    txt = compiled.as_text()
    total = 0
    count = 0
    for m in re.finditer(r"= (\w+\[[^\]]*\][^ ]*) copy\(", txt):
        shape = m.group(1)
        dims = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if not dims:
            continue
        dtype, ds = dims.group(1), dims.group(2)
        n = int(np.prod([int(x) for x in ds.split(",") if x])) if ds else 1
        bytes_per = {"f32": 4, "bf16": 2, "s32": 4, "f16": 2,
                     "pred": 1, "u8": 1}.get(dtype, 4)
        total += n * bytes_per
        count += 1
    return {"copy_ops": count, "copy_gbytes": round(total / 1e9, 3)}


def hard_sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


# --- warp variants ----------------------------------------------------------

def warp_base(img, theta):
    return two_pass_affine_warp(img, theta)


def warp_fuse_t(img, theta):
    """No explicit activation transposes: einsums batch on non-leading
    dims and XLA picks the dot dimension order."""
    _, h, w, _ = img.shape
    dt = img.dtype if img.dtype == jnp.float32 else jnp.bfloat16
    mv = _build_mv(theta, h, w, "zeros", False, dt)   # (B, W, H, Ho)
    v = jnp.einsum("byxc,bxyi->bixc", img, mv,
                   preferred_element_type=jnp.float32).astype(dt)
    mh = _build_mh(theta, h, w, "zeros", False, dt)   # (B, Ho, W, Wo)
    out = jnp.einsum("bixc,bixj->bijc", v, mh,
                     preferred_element_type=jnp.float32)
    return out.astype(img.dtype)


def warp_layoutpin(img, theta):
    """Pin the transposed activations to their natural row-major layout
    so layout assignment cannot insert a differing-layout copy."""
    from jax.experimental.layout import Format, Layout, with_layout_constraint

    def pin(x):
        fmt = Format(Layout(tuple(range(x.ndim))))
        return with_layout_constraint(x, fmt)

    _, h, w, _ = img.shape
    dt = img.dtype if img.dtype == jnp.float32 else jnp.bfloat16
    img_x = pin(img.swapaxes(1, 2))
    mv = _build_mv(theta, h, w, "zeros", False, dt)
    v = jnp.einsum("bxyc,bxyi->bxic", img_x, mv,
                   preferred_element_type=jnp.float32).astype(dt)
    v_i = pin(v.swapaxes(1, 2))
    mh = _build_mh(theta, h, w, "zeros", False, dt)
    out = jnp.einsum("bixc,bixj->bijc", v_i, mh,
                     preferred_element_type=jnp.float32)
    return out.astype(img.dtype)


WARPS = {"base": warp_base, "fuseT": warp_fuse_t, "layoutpin": warp_layoutpin}


def run_warp(variants):
    # flagship finest level: b16 f64 at 240x320
    b, h, w, c = 16, 240, 320, 64
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    theta = jnp.tile(jnp.asarray([[[1.02, 0.03, 0.01], [0.0, 0.97, -0.02]]],
                                 jnp.float32), (b, 1, 1))
    ref = None
    for name in variants:
        fn = WARPS[name]

        def fwd_bwd(img, theta, fn=fn):
            def loss(i, t):
                return jnp.sum(fn(i, t).astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(img, theta)
            return l, g

        jfn = jax.jit(fwd_bwd)
        compiled = jfn.lower(img, theta).compile()
        ms = timeit(jfn, img, theta)
        out = jax.jit(fn)(img, theta)
        if ref is None:
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
        print(f"warp {name:10s} {ms:7.2f} ms fwd+bwd  "
              f"{copy_stats(compiled)}  max|Δ|={err:.2e}", flush=True)


def run_model(variants):
    """Full geometry b16 train step with the warp backend patched."""
    sys.path.insert(0, ".")
    from bench import _build, hard_sync as hs

    import cadepth_tpu.ops.affine_warp as aw
    import cadepth_tpu.models.pcl as pcl_mod

    orig = aw.two_pass_affine_warp
    for name in variants:
        if name == "base":
            pcl_mod.two_pass_affine_warp = orig
        else:
            fn = WARPS[name]
            pcl_mod.two_pass_affine_warp = (
                lambda img, th, padding_mode="zeros", align_corners=False,
                precision=None, fn=fn: fn(img, th))
        cfg, state, train_step, batch = _build(
            "geometry_aware", 16, init_features=64, pcl_warp="two_pass")
        for _ in range(3):
            state, logs = train_step(state, batch)
        hs(state)
        t0 = time.perf_counter()
        for _ in range(20):
            state, logs = train_step(state, batch)
        hs(state)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"model {name:10s} {ms:7.1f} ms/step  "
              f"{16 / ms * 1e3:6.1f} img/s", flush=True)
    pcl_mod.two_pass_affine_warp = orig


if __name__ == "__main__":
    enable_compilation_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "warp"
    variants = sys.argv[2:] or list(WARPS)
    if mode == "warp":
        run_warp(variants)
    else:
        run_model(variants)

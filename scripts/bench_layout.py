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

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cadepth_tpu.ops.affine_warp import (
    _build_mh,
    _build_mv,
    _tent,
    affine_pixel_coeffs,
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
        return with_layout_constraint(x, Layout(tuple(range(x.ndim))))

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


def warp_bitcastpin(img, theta):
    """Pin each transposed activation to the layout that keeps the
    ORIGINAL memory bytes (major_to_minor permuted with the transpose),
    making the swapaxes a bitcast; the dot then consumes a non-default
    layout — either its emitter copes (copy eliminated) or it inserts
    its own copy (no worse)."""
    from jax.experimental.layout import Layout, with_layout_constraint

    def pin_swapped(x):
        # logical (B, d2, d1, C) over physical (B, d1, d2, C) bytes
        return with_layout_constraint(x, Layout((0, 2, 1, 3)))

    _, h, w, _ = img.shape
    dt = img.dtype if img.dtype == jnp.float32 else jnp.bfloat16
    img_x = pin_swapped(img.swapaxes(1, 2))
    mv = _build_mv(theta, h, w, "zeros", False, dt)
    v = jnp.einsum("bxyc,bxyi->bxic", img_x, mv,
                   preferred_element_type=jnp.float32).astype(dt)
    v_i = pin_swapped(v.swapaxes(1, 2))
    mh = _build_mh(theta, h, w, "zeros", False, dt)
    out = jnp.einsum("bixc,bixj->bijc", v_i, mh,
                     preferred_element_type=jnp.float32)
    return out.astype(img.dtype)


def warp_hybrid(img, theta):
    """Row-space-only two-pass warp: V pass with the row-only tent
    matrix (B,Ho,H) — exact iff rotation D == 0, i.e. the SAME exact
    domain as two_pass — then the per-row H pass handling shear
    exactly. Both GEMMs contract against NHWC-contiguous activations
    ((y, x*c) and per-(b,i) (x, c) operands); no swapaxes anywhere, and
    the V-pass (B,W,H,Ho) matrix (590 MB at the finest level) shrinks
    to (B,Ho,H)."""
    _, h, w, _ = img.shape
    out_dtype = img.dtype
    dt = img.dtype if img.dtype == jnp.float32 else jnp.bfloat16
    _, _, _, _, e, f = affine_pixel_coeffs(theta, h, w, False)
    iis = jnp.arange(h, dtype=jnp.float32)
    py = e[:, None] * iis[None, :] + f[:, None]           # (B, Ho)
    mv = _tent(py, h, "zeros", dt)                        # (B, Ho, H)
    v = jnp.einsum("biy,byxc->bixc", mv, img,
                   preferred_element_type=jnp.float32).astype(dt)
    mh = _build_mh(theta, h, w, "zeros", False, dt)       # (B, Ho, W, Wo)
    out = jnp.einsum("bixc,bixj->bijc", v, mh,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def warp_fencepin(img, theta):
    """Fence the churn at the warp boundary: pin the warp's input and
    output to canonical NHWC so the dots' exotic layout preferences
    cannot propagate into the surrounding convs/BN/attention (the
    modelhlo analysis shows 3.3 GB of finest-level copies spread across
    ops far from the PCL — global layout churn, not warp-local cost)."""
    from jax.experimental.layout import Layout, with_layout_constraint

    nhwc = Layout((0, 1, 2, 3))
    img = with_layout_constraint(img, nhwc)
    out = two_pass_affine_warp(img, theta)
    return with_layout_constraint(out, nhwc)


def warp_nowarp(img, theta):
    """Identity control: measures the conv-only copy baseline of the
    mini harness."""
    return img


WARPS = {"nowarp": warp_nowarp, "base": warp_base, "fuseT": warp_fuse_t,
         "layoutpin": warp_layoutpin, "bitcastpin": warp_bitcastpin,
         "fencepin": warp_fencepin, "hybrid": warp_hybrid}


def run_mini(variants):
    """conv3x3 -> warp -> conv3x3 at the finest level: reproduces the
    conv<->warp layout interface where the in-model copies arise, at a
    fraction of the full-model compile time."""
    b, h, w, c = 16, 240, 320, 64
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    k1 = jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.05
    k2 = jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.05
    theta = jnp.tile(jnp.asarray([[[1.02, 0.03, 0.01], [0.0, 0.97, -0.02]]],
                                 jnp.float32), (b, 1, 1))

    for name in variants:
        fn = WARPS[name]

        def block(img, k1, k2, theta, fn=fn):
            y = jax.lax.conv_general_dilated(
                img, k1.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = fn(y, theta)
            y = jax.lax.conv_general_dilated(
                y, k2.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y

        def fwd_bwd(img, k1, k2, theta, fn=fn):
            def loss(i, a, b2, t):
                return jnp.sum(block(i, a, b2, t, fn).astype(jnp.float32)
                               ** 2)
            return jax.value_and_grad(loss, argnums=(1, 2))(img, k1, k2,
                                                            theta)

        jfn = jax.jit(fwd_bwd)
        compiled = jfn.lower(img, k1, k2, theta).compile()
        txt = compiled.as_text()
        import re

        total = 0
        for m in re.finditer(r"= (\w+)\[([\d,]*)\](\{[^}]*\})? copy\(", txt):
            n = int(np.prod([int(x) for x in m.group(2).split(",") if x]))
            total += n * {"f32": 4, "bf16": 2}.get(m.group(1), 4)
        ms = timeit(jfn, img, k1, k2, theta)
        out = jax.jit(lambda i, a, b2, t, fn=fn: block(i, a, b2, t, fn))(
            img, k1, k2, theta)
        print(f"mini {name:11s} {ms:7.2f} ms fwd+bwd  "
              f"copies {total/1e9:.3f} GB  out[0,0,0,0]="
              f"{float(np.asarray(out[0, 0, 0, 0], np.float32)):.4f}",
              flush=True)


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


def _patch_warp(name):
    import cadepth_tpu.models.pcl as pcl_mod
    import cadepth_tpu.ops.affine_warp as aw

    if name == "base":
        pcl_mod.two_pass_affine_warp = aw.two_pass_affine_warp
    else:
        fn = WARPS[name]
        pcl_mod.two_pass_affine_warp = (
            lambda img, th, padding_mode="zeros", align_corners=False,
            precision=None, fn=fn: fn(img, th))


def _build_model_step(name):
    sys.path.insert(0, ".")
    from bench import _build

    _patch_warp(name)
    return _build("geometry_aware", 16, init_features=64,
                  pcl_warp="two_pass")


def run_model(variants):
    """Full geometry b16 train step with the warp backend patched."""
    from bench import hard_sync as hs

    for name in variants:
        cfg, state, train_step, batch = _build_model_step(name)
        for _ in range(3):
            state, logs = train_step(state, batch)
        hs(state)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(20):
                state, logs = train_step(state, batch)
            hs(state)
            best = min(best, (time.perf_counter() - t0) / 20 * 1e3)
        print(f"model {name:10s} {best:7.1f} ms/step  "
              f"{16 / best * 1e3:6.1f} img/s", flush=True)


def run_modelhlo(variants):
    """Compile the full geometry b16 step and list the largest relayout
    copies in the optimized HLO — localizes the 6.1 GB/step tax."""
    import re

    for name in variants:
        cfg, state, train_step, batch = _build_model_step(name)
        compiled = train_step.lower(state, batch).compile()
        txt = compiled.as_text()
        path = f"/tmp/geo_step_{name}.hlo"
        with open(path, "w") as f:
            f.write(txt)
        print(f"model {name}: HLO dumped to {path} "
              f"({len(txt)/1e6:.1f} MB)", flush=True)
        sizes = {}
        for m in re.finditer(
                r"= (\w+)\[([\d,]*)\](\{[\d,]*\})? copy\(", txt):
            dtype, ds = m.group(1), m.group(2)
            n = int(np.prod([int(x) for x in ds.split(",") if x])) if ds else 1
            bp = {"f32": 4, "bf16": 2, "s32": 4}.get(dtype, 4)
            key = f"{dtype}[{ds}]{m.group(3) or ''}"
            sizes[key] = sizes.get(key, np.zeros(2, np.int64)) + [n * bp, 1]
        top = sorted(sizes.items(), key=lambda kv: -kv[1][0])[:12]
        total = sum(v[0] for v in sizes.values())
        print(f"model {name}: total copy bytes {total/1e9:.2f} GB", flush=True)
        for key, (byts, cnt) in top:
            print(f"  {byts/1e6:9.1f} MB x  {cnt:3d}  {key}", flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "warp"
    variants = sys.argv[2:] or list(WARPS)
    if mode == "warp":
        run_warp(variants)
    elif mode == "mini":
        run_mini(variants)
    elif mode == "modelhlo":
        run_modelhlo(variants)
    else:
        run_model(variants)

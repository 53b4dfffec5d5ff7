#!/usr/bin/env python
"""Conv-warp-conv layout-neighborhood experiment (VERDICT r4 item 5).

PERF_NOTES ("Mosaic compiles the Pallas warp now") ends with the one
untried flagship-MFU idea: control layout across the upconv->warp->conv
NEIGHBORHOOD instead of inside the warp. This probe implements the
algebraic version: compose the decoder's ConvTranspose-2x2-s2 into the
warp's V-pass GEMMs.

A 2x2 stride-2 transpose conv is non-overlapping:

    y[2i+p, 2j+q, d] = sum_c x[i, j, c] K[p, q, c, d]

so the warp's row-space V pass (out_v[o] = sum_r mv[o, r] y[r]) splits
by source-row parity p into two half-height GEMMs against the
width-phase tensors z_p (one (hw, C) @ (C, 4D) GEMM + reshape builds
both), and the (B, 2h, 2w, D) intermediate y NEVER materializes between
the upconv and the V pass:

    out_v[o] = mv[o, 0::2] @ z_0  +  mv[o, 1::2] @ z_1

FLOP-neutral (same contraction totals), removes one full-resolution
layout boundary. The H pass and the trailing 3x3 conv are unchanged.
Exactness domain = the row-space ("hybrid") V pass: identical to the
shipped two_pass for zero predicted rotation, which pcl_max_rot
monitoring shows holds to ~0.04 rad in trained flagships. (theta's
pooled-feature input is also recoverable pre-upconv:
GAP(y) = GAP(x) @ sum_pq K[p,q] / 4 exactly, so full-model integration
would not need y either.)

Variants (all fwd+bwd with grads wrt both conv kernels, b16):
    sep       — conv_transpose -> shipped two_pass warp (custom VJP) -> conv3x3
    sep_h     — conv_transpose -> row-space hybrid warp (autodiff)   -> conv3x3
    composed  — phase-composed upconv+V pass (autodiff) -> H pass    -> conv3x3

Usage: python scripts/probe_upconv_warp.py [b] [h] [w] [cin] [cout]
Defaults: the flagship's finest decoder block, 16 120 160 128 64.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os as _os
_sys_path = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _sys_path)

import jax
import jax.numpy as jnp

from cadepth_tpu.ops.affine_warp import (
    _build_mh,
    _tent,
    affine_pixel_coeffs,
    two_pass_affine_warp,
)
from cadepth_tpu.utils import enable_compilation_cache


def hard_sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timeit(fn, *args, steps=20, warmup=3, windows=2):
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        hard_sync(out)
        best = min(best, (time.perf_counter() - t0) / steps * 1e3)
    return best


def copy_gbytes(compiled) -> float:
    import re

    total = 0
    for m in re.finditer(r"= (\w+)\[([\d,]*)\](\{[^}]*\})? copy\(",
                         compiled.as_text()):
        n = int(np.prod([int(x) for x in m.group(2).split(",") if x]))
        total += n * {"f32": 4, "bf16": 2}.get(m.group(1), 4)
    return round(total / 1e9, 3)


def upconv(x, k):
    return jax.lax.conv_transpose(
        x, k, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def hybrid_warp(img, theta):
    """Row-space V pass + per-row H pass (bench_layout.py warp_hybrid)."""
    _, h, w, _ = img.shape
    dt = img.dtype if img.dtype == jnp.float32 else jnp.bfloat16
    _, _, _, _, e, f = affine_pixel_coeffs(theta, h, w, False)
    iis = jnp.arange(h, dtype=jnp.float32)
    py = e[:, None] * iis[None, :] + f[:, None]
    mv = _tent(py, h, "zeros", dt)                        # (B, Ho, H)
    v = jnp.einsum("biy,byxc->bixc", mv, img,
                   preferred_element_type=jnp.float32).astype(dt)
    mh = _build_mh(theta, h, w, "zeros", False, dt)       # (B, Ho, W, Wo)
    out = jnp.einsum("bixc,bixj->bijc", v, mh,
                     preferred_element_type=jnp.float32)
    return out.astype(img.dtype)


def composed_upconv_warp(x, k, theta):
    """Phase-composed ConvTranspose(2,2,s2) + row-space V pass + H pass."""
    b, h, w, cin = x.shape
    big_h, big_w = 2 * h, 2 * w
    cout = k.shape[-1]
    dt = x.dtype if x.dtype == jnp.float32 else jnp.bfloat16
    # lax.conv_transpose applies the kernel spatially FLIPPED
    # (y[2i+p, 2j+q] = sum_c x[i,j,c] K[1-p, 1-q, c, d] — verified
    # empirically); flip once here so phase p/q means output parity.
    kf = k[::-1, ::-1].astype(x.dtype)
    # one (h*w, Cin) @ (Cin, 2*2*Cout) GEMM builds every phase at once
    t = jnp.einsum("bijc,pqcd->bpijqd", x, kf,
                   preferred_element_type=jnp.float32).astype(dt)
    z = t.reshape(b, 2, h, big_w, cout)     # (j,q)->2j+q width interleave
    _, _, _, _, e, f = affine_pixel_coeffs(theta, big_h, big_w, False)
    iis = jnp.arange(big_h, dtype=jnp.float32)
    py = e[:, None] * iis[None, :] + f[:, None]
    mv = _tent(py, big_h, "zeros", dt)      # (B, Ho=2h, source rows 2h)
    out_v = (jnp.einsum("boi,bixc->boxc", mv[:, :, 0::2], z[:, 0],
                        preferred_element_type=jnp.float32)
             + jnp.einsum("boi,bixc->boxc", mv[:, :, 1::2], z[:, 1],
                          preferred_element_type=jnp.float32)).astype(dt)
    mh = _build_mh(theta, big_h, big_w, "zeros", False, dt)
    out = jnp.einsum("bixc,bixj->bijc", out_v, mh,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def main() -> None:
    argv = sys.argv[1:]
    b, h, w, cin, cout = (int(a) for a in argv) if len(argv) == 5 else (
        16, 120, 160, 128, 64)
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
    k_up = (jax.random.normal(key, (2, 2, cin, cout), jnp.float32)
            * (1.0 / np.sqrt(cin)))
    k2 = (jax.random.normal(key, (3, 3, cout, cout), jnp.float32) * 0.05)
    theta = jnp.tile(jnp.asarray([[[1.02, 0.03, 0.01], [0.0, 0.97, -0.02]]],
                                 jnp.float32), (b, 1, 1))

    def neighborhood(warp_kind):
        def block(x, k_up, k2, theta):
            ku = k_up.astype(jnp.bfloat16)
            if warp_kind == "composed":
                y = composed_upconv_warp(x, ku, theta)
            else:
                y = upconv(x, ku)
                y = (two_pass_affine_warp(y, theta) if warp_kind == "sep"
                     else hybrid_warp(y, theta))
            return jax.lax.conv_general_dilated(
                y, k2.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def fwd_bwd(x, k_up, k2, theta):
            def loss(a, b2):
                return jnp.sum(block(x, a, b2, theta).astype(jnp.float32)
                               ** 2)
            return jax.value_and_grad(loss, argnums=(0, 1))(k_up, k2)

        return block, fwd_bwd

    # numeric parity: composed must equal upconv -> hybrid warp exactly
    # (same algebra, reassociated) — f32 end to end for the check
    xf = x.astype(jnp.float32)
    ref = hybrid_warp(upconv(xf, k_up), theta)
    got = composed_upconv_warp(xf, k_up, theta)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"composed-vs-sep_h f32 rel err: {err:.2e}", flush=True)
    assert err < 1e-5, err

    report = {"shape": [b, h, w, cin, cout], "f32_rel_err": err}
    for name in ("sep", "sep_h", "composed"):
        block, fwd_bwd = neighborhood(name)
        jf = jax.jit(fwd_bwd)
        compiled = jf.lower(x, k_up, k2, theta).compile()
        gb = copy_gbytes(compiled)
        ms = timeit(jf, x, k_up, k2, theta)
        # forward timing must read back a SCALAR — np.asarray of the
        # full (B,2h,2w,C) output crosses the ~8.6 MB/s D2H tunnel and
        # dominates the window (~0.9 s/step measured)
        fwd_scalar = jax.jit(
            lambda *a: block(*a).astype(jnp.float32).sum())
        fwd_ms = timeit(fwd_scalar, x, k_up, k2, theta)
        report[name] = {"fwd_ms": round(fwd_ms, 2),
                        "fwd_bwd_ms": round(ms, 2), "copy_gb": gb}
        print(f"{name:9s} fwd {fwd_ms:6.2f} ms   fwd+bwd {ms:6.2f} ms   "
              f"copies {gb:.3f} GB", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

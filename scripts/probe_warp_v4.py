#!/usr/bin/env python
"""On-chip probe for the fused NHWC banded warp (ops/pallas/fused_warp).

Compiles, parity-checks and times the fused kernel against the XLA
two-pass warp and the width-major Pallas kernel at the flagship's
finest PCL level (b16, 240x320, 64ch, bf16). Records outcomes to JSON
either way (compiler errors included). ~2-4 min warm cache.

Usage: python scripts/probe_warp_v4.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

_sys_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _sys_dir)

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp
    from cadepth_tpu.ops.pallas.fused_warp import (
        fused_warp_theta_ok,
        pallas_fused_warp,
        pallas_fused_warp_trainable,
    )
    from cadepth_tpu.ops.pallas.two_pass_warp import (
        pallas_two_pass_warp_trainable,
    )
    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    result = {"date": time.strftime("%Y-%m-%d %H:%M"),
              "device": str(jax.devices()[0])}

    b, h, w, c = 16, 240, 320, 64
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype=jnp.bfloat16)
    theta = jnp.asarray(np.tile(
        np.array([[0.98, -0.01, 0.03], [0.01, 1.02, -0.02]],
                 np.float32)[None], (b, 1, 1)))
    result["theta_ok"] = bool(np.asarray(
        fused_warp_theta_ok(theta, h, w)).all())

    fence_prog = jax.jit(
        lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[0]
        .astype(jnp.float32))

    def fence(out):
        return float(np.asarray(fence_prog(out)))

    def timed(fn, *args,
              iters=int(os.environ.get("CADEPTH_PROBE_ITERS", "20"))):
        out = fn(*args)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        return (time.perf_counter() - t0) / iters * 1e3

    # 1. forward: fused vs XLA two_pass
    try:
        fwd = jax.jit(lambda im, th: pallas_fused_warp(im, th))
        ms = timed(fwd, img, theta)
        ref = jax.jit(lambda im, th: two_pass_affine_warp(im, th))
        ms_ref = timed(ref, img, theta)
        got = np.asarray(fwd(img, theta), np.float32)
        want = np.asarray(ref(img, theta), np.float32)
        result["forward"] = {
            "ok": True, "ms": round(ms, 2),
            "xla_two_pass_ms": round(ms_ref, 2),
            "max_abs_err_vs_xla": float(np.max(np.abs(got - want)))}
        print("forward", result["forward"], flush=True)
    except Exception:  # noqa: BLE001 - probe must record, not raise
        result["forward"] = {"ok": False,
                             "error": traceback.format_exc()[-1500:]}
        print("forward FAILED", flush=True)

    # 2. forward+backward: fused vs XLA vs old pallas
    try:
        def loss_fused(im, th):
            return jnp.sum(
                pallas_fused_warp_trainable(im, th).astype(jnp.float32))

        def loss_old(im, th):
            return jnp.sum(
                pallas_two_pass_warp_trainable(im, th).astype(jnp.float32))

        def loss_ref(im, th):
            return jnp.sum(two_pass_affine_warp(im, th).astype(jnp.float32))

        gfn = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))
        ms = timed(gfn, img, theta)
        gfn_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))
        ms_ref = timed(gfn_ref, img, theta)
        gfn_old = jax.jit(jax.grad(loss_old, argnums=(0, 1)))
        ms_old = timed(gfn_old, img, theta)
        gp = gfn(img, theta)
        gr = gfn_ref(img, theta)
        dth_p = np.asarray(gp[1], np.float32)
        dth_r = np.asarray(gr[1], np.float32)
        dth_scale = float(np.max(np.abs(dth_r)))
        result["grad"] = {
            "ok": True, "ms": round(ms, 2),
            "xla_two_pass_ms": round(ms_ref, 2),
            "old_pallas_ms": round(ms_old, 2),
            "d_img_max_err": float(np.max(np.abs(
                np.asarray(gp[0], np.float32)
                - np.asarray(gr[0], np.float32)))),
            "d_theta_max_rel_err": float(
                np.max(np.abs(dth_p - dth_r)) / max(dth_scale, 1e-30))}
        print("grad", result["grad"], flush=True)
    except Exception:  # noqa: BLE001
        result["grad"] = {"ok": False,
                          "error": traceback.format_exc()[-1500:]}
        print("grad FAILED", flush=True)

    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "/tmp/fused_warp_probe.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: (v if not isinstance(v, dict) else
                          {kk: vv for kk, vv in v.items() if kk != "error"})
                      for k, v in result.items()}, indent=2))
    return 0 if result.get("forward", {}).get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())

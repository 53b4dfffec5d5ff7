#!/usr/bin/env python
"""On-chip cost decomposition + v2 variants for the Pallas two-pass warp.

The round-4 kernel compiles and is parity-exact but LOSES 9% in-model
(PERF_NOTES "Mosaic compiles the Pallas warp now"): the per-column
(Ho,H)@(H,C) dots under-fill the MXU and pay per-dot issue overhead.
This probe measures WHERE the standalone time goes and whether any v2
formulation beats the shipped kernel, all at the flagship's finest PCL
level (b16, 240x320, 64ch, bf16):

  tilescan  — shipped full fwd at unroll tile 4/8/16/32 (grid-overhead
              sensitivity; env knob CADEPTH_PALLAS_WARP_TILE)
  vpass     — the V pass alone (baseline for the decomposition)
  vpass_notent — same loop, tent replaced by a constant matrix
              (isolates dot+memory cost; NOT parity-checked)
  vpass_nodot  — tent generated, dot replaced by a row-reduction
              (isolates tent-generation cost; NOT parity-checked)
  vpass_tent3d — tent for all xt columns generated ONCE as a 3-D iota
              tensor, dots still per-column (vectorized tent gen)
  vpass_batched — ONE jax.lax.dot_general with a batch dim per grid
              cell: (xt,Ho,H) x (xt,H,C) -> (xt,Ho,C)  [v2 candidate]
  vpass_tn  — transposed-N per-column dots (C,H)@(H,Ho) so the MXU
              lane dim is Ho=240 not C=64  [v2 candidate]

Writes JSON to argv[1] (default /tmp/warp_v2_probe.json). Every variant
records ok/ms/err-vs-baseline or the compiler error; the probe never
raises. ~2-4 min warm cache.
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cadepth_tpu.ops.affine_warp import (
        affine_pixel_coeffs,
        two_pass_affine_warp,
    )
    from cadepth_tpu.ops.pallas import two_pass_warp as tpw
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
    img_t = jnp.transpose(img, (0, 2, 1, 3))          # (B, W, H, C)
    coefs = jnp.stack(affine_pixel_coeffs(theta, h, w, False), -1)

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
        return (time.perf_counter() - t0) / iters * 1e3, out

    def attempt(name, build, ref_out=None):
        try:
            fn = build()
            ms, out = timed(fn, coefs, img_t)
            rec = {"ok": True, "ms": round(ms, 2)}
            if ref_out is not None:
                rec["max_abs_err"] = float(np.max(np.abs(
                    np.asarray(out, np.float32)
                    - np.asarray(ref_out, np.float32))))
            result[name] = rec
            print(name, rec, flush=True)
            return out
        except Exception:  # noqa: BLE001 - probe records, never raises
            result[name] = {"ok": False,
                            "error": traceback.format_exc()[-1200:]}
            print(name, "FAILED", flush=True)
            return None

    # ---- 0. XLA reference + shipped full fwd tile scan -------------
    try:
        ref = jax.jit(lambda im, th: two_pass_affine_warp(im, th))
        ms, _ = timed(ref, img, theta)
        result["xla_two_pass_full_fwd"] = {"ok": True, "ms": round(ms, 2)}
        print("xla_two_pass_full_fwd", result["xla_two_pass_full_fwd"],
              flush=True)
    except Exception:  # noqa: BLE001
        result["xla_two_pass_full_fwd"] = {
            "ok": False, "error": traceback.format_exc()[-1200:]}

    for tile in (4, 8, 16, 32):
        os.environ["CADEPTH_PALLAS_WARP_TILE"] = str(tile)
        try:
            fwd = jax.jit(functools.partial(
                tpw.pallas_two_pass_warp, interpret=False))
            ms, _ = timed(fwd, img, theta)
            result[f"full_fwd_tile{tile}"] = {"ok": True, "ms": round(ms, 2)}
            print(f"full_fwd_tile{tile}", result[f"full_fwd_tile{tile}"],
                  flush=True)
        except Exception:  # noqa: BLE001
            result[f"full_fwd_tile{tile}"] = {
                "ok": False, "error": traceback.format_exc()[-1200:]}
            print(f"full_fwd_tile{tile} FAILED", flush=True)
    os.environ["CADEPTH_PALLAS_WARP_TILE"] = "8"

    # ---- V-pass-only harness ---------------------------------------
    xt = 8

    def vpass_call(kernel, out_minor=c, block_h=h):
        return jax.jit(pl.pallas_call(
            kernel,
            grid=(b, w // xt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, xt, block_h, c), lambda bb, x: (bb, x, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, xt, h, out_minor),
                                   lambda bb, x: (bb, x, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, w, h, out_minor),
                                           jnp.bfloat16),
        ))

    base_kernel = functools.partial(tpw._pass_v_kernel, height=h, width=w,
                                    xt=xt, border=False, mat_bf16=True)
    v_base = attempt("vpass_base", lambda: vpass_call(base_kernel))

    # ---- decomposition: dot-only (constant tent) --------------------
    def _v_notent(coef_ref, img_ref, out_ref):
        iis = tpw._fiota((h, 1), 0)
        ys = tpw._fiota((1, h), 1)
        mv = jnp.maximum(1.0 - jnp.abs(iis - ys), 0.0).astype(jnp.bfloat16)
        for dx in range(xt):
            col = img_ref[0, dx, :, :]
            v = jax.lax.dot_general(
                mv, col, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, dx, :, :] = v.astype(out_ref.dtype)

    attempt("vpass_notent", lambda: vpass_call(_v_notent))

    # ---- decomposition: tent-only (no dot) ---------------------------
    def _v_nodot(coef_ref, img_ref, out_ref):
        bb_ = pl.program_id(0)
        xtile = pl.program_id(1)
        a = coef_ref[bb_, 0]
        bcoef = coef_ref[bb_, 1]
        ccoef = coef_ref[bb_, 2]
        d = coef_ref[bb_, 3]
        e = coef_ref[bb_, 4]
        f = coef_ref[bb_, 5]
        a_safe = jnp.where(jnp.abs(a) < 1e-3,
                           jnp.where(a < 0, -1e-3, 1e-3), a)
        doa = d / a_safe
        iis = tpw._fiota((h, 1), 0)
        ys = tpw._fiota((1, h), 1)
        for dx in range(xt):
            x = (xtile * xt + dx).astype(jnp.float32)
            g = doa * x + (e - doa * bcoef) * iis + (f - doa * ccoef)
            mv = jnp.maximum(1.0 - jnp.abs(g - ys), 0.0)
            s = jnp.sum(mv, axis=1, keepdims=True)          # (Ho, 1)
            out_ref[0, dx, :, :] = jnp.broadcast_to(
                s, (h, c)).astype(out_ref.dtype)
        del img_ref

    attempt("vpass_nodot", lambda: vpass_call(_v_nodot))

    # ---- v2a: tent generated once per cell as 3-D iota ---------------
    def _v_tent3d(coef_ref, img_ref, out_ref):
        bb_ = pl.program_id(0)
        xtile = pl.program_id(1)
        a = coef_ref[bb_, 0]
        bcoef = coef_ref[bb_, 1]
        ccoef = coef_ref[bb_, 2]
        d = coef_ref[bb_, 3]
        e = coef_ref[bb_, 4]
        f = coef_ref[bb_, 5]
        a_safe = jnp.where(jnp.abs(a) < 1e-3,
                           jnp.where(a < 0, -1e-3, 1e-3), a)
        doa = d / a_safe
        x0 = (xtile * xt).astype(jnp.float32)
        xi = jax.lax.broadcasted_iota(
            jnp.int32, (xt, h, 1), 0).astype(jnp.float32) + x0
        iis = jax.lax.broadcasted_iota(
            jnp.int32, (xt, h, 1), 1).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(
            jnp.int32, (xt, 1, h), 2).astype(jnp.float32)
        g = doa * xi + (e - doa * bcoef) * iis + (f - doa * ccoef)
        mv = jnp.maximum(1.0 - jnp.abs(g - ys), 0.0).astype(jnp.bfloat16)
        for dx in range(xt):
            col = img_ref[0, dx, :, :]
            v = jax.lax.dot_general(
                mv[dx], col, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, dx, :, :] = v.astype(out_ref.dtype)

    attempt("vpass_tent3d", lambda: vpass_call(_v_tent3d), ref_out=v_base)

    # ---- v2b: ONE batched dot_general per cell ------------------------
    def _v_batched(coef_ref, img_ref, out_ref):
        bb_ = pl.program_id(0)
        xtile = pl.program_id(1)
        a = coef_ref[bb_, 0]
        bcoef = coef_ref[bb_, 1]
        ccoef = coef_ref[bb_, 2]
        d = coef_ref[bb_, 3]
        e = coef_ref[bb_, 4]
        f = coef_ref[bb_, 5]
        a_safe = jnp.where(jnp.abs(a) < 1e-3,
                           jnp.where(a < 0, -1e-3, 1e-3), a)
        doa = d / a_safe
        x0 = (xtile * xt).astype(jnp.float32)
        xi = jax.lax.broadcasted_iota(
            jnp.int32, (xt, h, 1), 0).astype(jnp.float32) + x0
        iis = jax.lax.broadcasted_iota(
            jnp.int32, (xt, h, 1), 1).astype(jnp.float32)
        ys = jax.lax.broadcasted_iota(
            jnp.int32, (xt, 1, h), 2).astype(jnp.float32)
        g = doa * xi + (e - doa * bcoef) * iis + (f - doa * ccoef)
        mv = jnp.maximum(1.0 - jnp.abs(g - ys), 0.0).astype(jnp.bfloat16)
        cols = img_ref[0]                                 # (xt, H, C)
        v = jax.lax.dot_general(
            mv, cols, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (xt, Ho, C)
        out_ref[0] = v.astype(out_ref.dtype)

    attempt("vpass_batched", lambda: vpass_call(_v_batched), ref_out=v_base)

    # ---- v2c: transposed-N per-column dots (C,H)@(H,Ho) ---------------
    img_cm = jnp.transpose(img, (0, 2, 3, 1))             # (B, W, C, H)

    def _v_tn(coef_ref, img_ref, out_ref):
        bb_ = pl.program_id(0)
        xtile = pl.program_id(1)
        a = coef_ref[bb_, 0]
        bcoef = coef_ref[bb_, 1]
        ccoef = coef_ref[bb_, 2]
        d = coef_ref[bb_, 3]
        e = coef_ref[bb_, 4]
        f = coef_ref[bb_, 5]
        a_safe = jnp.where(jnp.abs(a) < 1e-3,
                           jnp.where(a < 0, -1e-3, 1e-3), a)
        doa = d / a_safe
        # tent TRANSPOSED: rows y, cols i -> (H, Ho)
        ys = tpw._fiota((h, 1), 0)
        iis = tpw._fiota((1, h), 1)
        for dx in range(xt):
            x = (xtile * xt + dx).astype(jnp.float32)
            g = doa * x + (e - doa * bcoef) * iis + (f - doa * ccoef)
            mvt = jnp.maximum(1.0 - jnp.abs(g - ys), 0.0).astype(
                jnp.bfloat16)                              # (H, Ho)
            colT = img_ref[0, dx, :, :]                    # (C, H)
            v = jax.lax.dot_general(
                colT, mvt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (C, Ho)
            out_ref[0, dx, :, :] = v.astype(out_ref.dtype)

    def tn_call():
        return jax.jit(pl.pallas_call(
            _v_tn,
            grid=(b, w // xt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, xt, c, h), lambda bb, x: (bb, x, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, xt, c, h),
                                   lambda bb, x: (bb, x, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, w, c, h), jnp.bfloat16),
        ))

    try:
        fn = tn_call()
        ms, out = timed(fn, coefs, img_cm)
        rec = {"ok": True, "ms": round(ms, 2)}
        if v_base is not None:
            got = np.transpose(np.asarray(out, np.float32), (0, 1, 3, 2))
            rec["max_abs_err"] = float(np.max(np.abs(
                got - np.asarray(v_base, np.float32))))
        result["vpass_tn"] = rec
        print("vpass_tn", rec, flush=True)
    except Exception:  # noqa: BLE001
        result["vpass_tn"] = {"ok": False,
                              "error": traceback.format_exc()[-1200:]}
        print("vpass_tn FAILED", flush=True)

    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "/tmp/warp_v2_probe.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "error"}
                      if isinstance(v, dict) else v
                      for k, v in result.items()}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

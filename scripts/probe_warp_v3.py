#!/usr/bin/env python
"""Mosaic building-block probes for a fused NHWC-native warp kernel (v3).

probe_warp_v2.py showed the shipped Pallas warp is block-TRAFFIC bound
(dot and tent each free beneath it), with the lane dim's 64->128 pad
wasting half the DMA. A fused single-kernel warp that reads NHWC
(B,H,W,Cc) blocks and writes NHWC output in ONE HBM round trip would
cut traffic ~4x and kill the in-model layout churn — IF Mosaic accepts
the needed constructs. Each probe is minimal and independent:

  p0_transpose_cost — XLA (B,H,W,C)->(B,H,C,W) permute, ms (for scale)
  p1_dynamic_row    — dynamic leading-dim read img[y0+k] with a traced
                      scalar y0 from SMEM coefficients
  p2_banded_blend   — the 2-sparse/banded V pass: per output row,
                      K dynamic slab reads x tent-weight FMA (VPU only,
                      no MXU), input block revisited across i-tiles
  p2b               — same with the i-tile grid dim OUTER (measures the
                      revisit DMA-skip: if skipping works, p2 << p2b)
  p3_kernel_transpose — in-kernel jnp.transpose of a (W, Cc) tile
  p4_fori           — simple fori_loop over rows (no DMA) with a dot
  p5_hpass_tn       — per-row dots (Cc,W)@(W,Wo) on (1,ht,Cc,W) blocks
                      (the full-lane H pass orientation)

Writes JSON to argv[1] (default /tmp/warp_v3_probe.json); never raises.
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

    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    result = {"date": time.strftime("%Y-%m-%d %H:%M"),
              "device": str(jax.devices()[0])}

    b, h, w, c = 16, 240, 320, 64
    cc = 32                                   # channel chunk
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype=jnp.bfloat16)
    # coefs: q (y-scale), r (y-offset), p (x-shear of vertical pos)
    coefs = jnp.asarray(np.tile(np.array(
        [[1.02, -2.0, 0.01]], np.float32), (b, 1)))

    fence_prog = jax.jit(
        lambda t: jax.tree_util.tree_leaves(t)[0].ravel()[0]
        .astype(jnp.float32))

    def fence(out):
        return float(np.asarray(fence_prog(out)))

    def timed(fn, *args, iters=20):
        out = fn(*args)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        return (time.perf_counter() - t0) / iters * 1e3, out

    def attempt(name, build, *args, check=None):
        try:
            fn = build()
            ms, out = timed(fn, *args)
            rec = {"ok": True, "ms": round(ms, 2)}
            if check is not None:
                rec["max_abs_err"] = float(check(out))
            result[name] = rec
            print(name, rec, flush=True)
            return out
        except Exception:  # noqa: BLE001
            result[name] = {"ok": False,
                            "error": traceback.format_exc()[-1200:]}
            print(name, "FAILED:",
                  result[name]["error"].splitlines()[-1], flush=True)
            return None

    # ---- p0: XLA permute cost ---------------------------------------
    attempt("p0_transpose_cost",
            lambda: jax.jit(lambda x: jnp.transpose(x, (0, 1, 3, 2))), img)
    attempt("p0_transpose_whc",
            lambda: jax.jit(lambda x: jnp.transpose(x, (0, 2, 1, 3))), img)

    # ---- p1: dynamic leading-dim read --------------------------------
    def _p1_kernel(coef_ref, img_ref, out_ref):
        bb = pl.program_id(0)
        r = coef_ref[bb, 1]
        y0 = jnp.floor(r + 10.0).astype(jnp.int32)
        y0 = jnp.clip(y0, 0, h - 9)
        for k in range(8):
            out_ref[0, k] = img_ref[0, y0 + k]

    def p1_build():
        return jax.jit(pl.pallas_call(
            _p1_kernel,
            grid=(b, c // cc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, h, w, cc), lambda bb, ci: (bb, 0, 0, ci)),
            ],
            out_specs=pl.BlockSpec((1, 8, w, cc),
                                   lambda bb, ci: (bb, 0, 0, ci)),
            out_shape=jax.ShapeDtypeStruct((b, 8, w, c), jnp.bfloat16),
        ))

    def p1_check(out):
        y0 = int(np.floor(-2.0 + 10.0))
        want = np.asarray(img[:, y0:y0 + 8], np.float32)
        return np.max(np.abs(np.asarray(out, np.float32) - want))

    attempt("p1_dynamic_row", p1_build, coefs, img, check=p1_check)

    # ---- p2: banded V pass (2-sparse blend, VPU only) ----------------
    K = 8          # static band; covers |p|*W <= 5 px plus the 2 taps
    it = 8

    def _banded_kernel(coef_ref, img_ref, out_ref, *, itile_dim: int):
        bb = pl.program_id(0)
        itile = pl.program_id(itile_dim)
        q = coef_ref[bb, 0]
        r = coef_ref[bb, 1]
        p = coef_ref[bb, 2]
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(
            jnp.float32)
        # analytic scalar band base (dynamic indices must stay in the
        # scalar unit — a vector min would need a cross-lane reduction)
        pmin = jnp.minimum(p * (w - 1.0), 0.0)
        for di in range(it):
            i = (itile * it + di).astype(jnp.float32)
            gy = q * i + r + p * xs                       # (1, W)
            base_f = q * i + r + pmin
            y0 = jnp.floor(base_f).astype(jnp.int32)
            y0 = jnp.clip(y0, 0, h - K)
            acc = jnp.zeros((w, cc), jnp.float32)
            for k in range(K):
                yk = (y0 + k).astype(jnp.float32)
                wk = jnp.maximum(1.0 - jnp.abs(gy - yk), 0.0)  # (1, W)
                slab = img_ref[0, y0 + k].astype(jnp.float32)  # (W, cc)
                acc = acc + wk.reshape(w, 1) * slab
            out_ref[0, di] = acc.astype(out_ref.dtype)

    def banded_build(i_outer: bool):
        if i_outer:
            grid = (b, h // it, c // cc)
            imap_in = lambda bb, ii, ci: (bb, 0, 0, ci)      # noqa: E731
            imap_out = lambda bb, ii, ci: (bb, ii, 0, ci)    # noqa: E731
            itile_dim = 1
        else:
            grid = (b, c // cc, h // it)
            imap_in = lambda bb, ci, ii: (bb, 0, 0, ci)      # noqa: E731
            imap_out = lambda bb, ci, ii: (bb, ii, 0, ci)    # noqa: E731
            itile_dim = 2
        return jax.jit(pl.pallas_call(
            functools.partial(_banded_kernel, itile_dim=itile_dim),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, h, w, cc), imap_in),
            ],
            out_specs=pl.BlockSpec((1, it, w, cc), imap_out),
            out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        ))

    def banded_check(out):
        # oracle: dense tent matmul on host for sample 0, channel 0
        q, r, p = 1.02, -2.0, 0.01
        ii = np.arange(h)[:, None]
        xs = np.arange(w)[None, :]
        gy = q * ii + r + p * xs                          # (Ho, W)
        im0 = np.asarray(img[0, :, :, 0], np.float32)     # (H, W)
        want = np.zeros((h, w), np.float32)
        pmin = min(p * (w - 1.0), 0.0)
        for i in range(h):
            base = int(np.clip(np.floor(q * i + r + pmin), 0, h - K))
            for k in range(K):
                wk = np.maximum(1.0 - np.abs(gy[i] - (base + k)), 0.0)
                want[i] += wk * im0[base + k]
        got = np.asarray(out[0, :, :, 0], np.float32)
        return np.max(np.abs(got - want))

    attempt("p2_banded_blend", lambda: banded_build(False), coefs, img,
            check=banded_check)
    attempt("p2b_banded_blend_iouter", lambda: banded_build(True),
            coefs, img, check=banded_check)

    # ---- p3: in-kernel 2-D transpose ---------------------------------
    def _p3_kernel(img_ref, out_ref):
        for y in range(4):
            tile = img_ref[0, y]                          # (W, cc)
            out_ref[0, y] = jnp.transpose(tile, (1, 0))   # (cc, W)

    attempt("p3_kernel_transpose", lambda: jax.jit(pl.pallas_call(
        _p3_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 4, w, cc), lambda bb: (bb, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 4, cc, w), lambda bb: (bb, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 4, cc, w), jnp.bfloat16),
    )), img)

    # ---- p4: simple fori_loop with a dot ------------------------------
    def _p4_kernel(img_ref, out_ref):
        mh = jnp.maximum(
            1.0 - jnp.abs(
                jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
                .astype(jnp.float32)
                - jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
                .astype(jnp.float32)), 0.0).astype(jnp.bfloat16)

        def body(y, _):
            row = img_ref[0, y]                           # (W, cc)
            o = jax.lax.dot_general(
                mh, row, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, y] = o.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, h, body, 0)

    attempt("p4_fori_dot", lambda: jax.jit(pl.pallas_call(
        _p4_kernel,
        grid=(b, c // cc),
        in_specs=[pl.BlockSpec((1, h, w, cc), lambda bb, ci: (bb, 0, 0, ci))],
        out_specs=pl.BlockSpec((1, h, w, cc), lambda bb, ci: (bb, 0, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
    )), img)

    # ---- p5: H pass, full-lane orientation (Cc,W)@(W,Wo) --------------
    img_cm = jnp.transpose(img, (0, 1, 3, 2))             # (B, H, C, W)
    ht = 8

    def _p5_kernel(coef_ref, img_ref, out_ref):
        bb = pl.program_id(0)
        q = coef_ref[bb, 0]
        r = coef_ref[bb, 1]
        htile = pl.program_id(2)
        # tent TRANSPOSED, built directly as (W=x rows, Wo=j cols)
        xs_r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(
            jnp.float32)                                  # x (rows)
        js_c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1).astype(
            jnp.float32)                                  # j (cols)
        for dy in range(ht):
            i = (htile * ht + dy).astype(jnp.float32)
            mhT = jnp.maximum(
                1.0 - jnp.abs(q * js_c + 0.001 * i + r - xs_r),
                0.0).astype(jnp.bfloat16)                 # (W, Wo)
            rowT = img_ref[0, dy]                         # (cc, W)
            o = jax.lax.dot_general(
                rowT, mhT, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (cc, Wo)
            out_ref[0, dy] = o.astype(out_ref.dtype)

    attempt("p5_hpass_tn", lambda: jax.jit(pl.pallas_call(
        _p5_kernel,
        grid=(b, c // cc, h // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ht, cc, w), lambda bb, ci, hi: (bb, hi, ci, 0)),
        ],
        out_specs=pl.BlockSpec((1, ht, cc, w),
                               lambda bb, ci, hi: (bb, hi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), jnp.bfloat16),
    )), coefs, img_cm)

    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "/tmp/warp_v3_probe.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "error"}
                      if isinstance(v, dict) else v
                      for k, v in result.items()}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Mosaic building-block probes for a fused NHWC-native warp kernel (v3).

probe_warp_v2.py showed the shipped Pallas warp is block-TRAFFIC bound
(dot and tent each free beneath it). A fused warp that reads NHWC
(1,H,wt,C) strips and writes NHWC output with no transposes would kill
both the kernel's standalone deficit and the in-model layout churn —
IF Mosaic accepts the needed constructs. Block shapes here follow the
(8,128)-divisible-or-equal-to-array rule (the first probe run failed it
with cc=32 channel chunks; C=64 blocks must span the full array dim).

  p0_transpose_cost — XLA layout permutes, ms (for scale)
  p1_dynamic_row    — dynamic second-dim read img[0, y0+k] with a traced
                      scalar y0 derived from SMEM coefficients
  p2_banded_blend   — the banded V pass: per output row, scalar band
                      base y0, K dynamic slab reads x tent-weight FMA
                      (VPU only, no MXU); input strip revisited across
                      i-tiles (inner grid dim -> DMA skip expected)
  p2b               — same with the i-tile grid dim OUTER (measures the
                      revisit DMA-skip: if skipping works, p2 << p2b)
  p4_fori_dot       — fori_loop over rows with a per-row dot
  p6_hpass_nhwc     — H pass on NHWC rows: per-row tent (Wo,W) built
                      in-kernel, standard (Wo,W)@(W,C) dot, grid
                      (b, H/it); V-block (1,it,W,C)
  p6b_hpass_c0      — same contraction expressed as ((0,),(0,)) against
                      an untransposed (W,Wo) tent (does Mosaic take it?)

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
    wt = 64                                   # W strip for the V pass
    it = 8                                    # output row tile
    K = 8                                     # V band taps
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype=jnp.bfloat16)
    # coefs: q (y-scale), r (y-offset), p (x-shear of vertical pos)
    q_c, r_c, p_c = 1.02, -2.0, 0.01
    coefs = jnp.asarray(np.tile(np.array(
        [[q_c, r_c, p_c]], np.float32), (b, 1)))

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
                            "error": traceback.format_exc()[-1600:]}
            print(name, "FAILED:",
                  result[name]["error"].splitlines()[-1], flush=True)
            return None

    # ---- p0: XLA permute cost ---------------------------------------
    attempt("p0_transpose_cost",
            lambda: jax.jit(lambda x: jnp.transpose(x, (0, 1, 3, 2))), img)

    # ---- p1: dynamic second-dim read ---------------------------------
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
            grid=(b, w // wt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, h, wt, c), lambda bb, xw: (bb, 0, xw, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, wt, c),
                                   lambda bb, xw: (bb, 0, xw, 0)),
            out_shape=jax.ShapeDtypeStruct((b, 8, w, c), jnp.bfloat16),
        ))

    def p1_check(out):
        y0 = int(np.floor(r_c + 10.0))
        want = np.asarray(img[:, y0:y0 + 8], np.float32)
        return np.max(np.abs(np.asarray(out, np.float32) - want))

    attempt("p1_dynamic_row", p1_build, coefs, img, check=p1_check)

    # ---- p2: banded V pass (K-tap blend, VPU only) ---------------------
    def _banded_kernel(coef_ref, img_ref, out_ref, *,
                       itile_dim: int, xtile_dim: int):
        bb = pl.program_id(0)
        itile = pl.program_id(itile_dim)
        xtile = pl.program_id(xtile_dim)
        q = coef_ref[bb, 0]
        r = coef_ref[bb, 1]
        p = coef_ref[bb, 2]
        x0 = (xtile * wt).astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(jnp.int32, (wt, 1), 0).astype(
            jnp.float32) + x0
        # analytic scalar band base over the strip (dynamic indices must
        # stay in the scalar unit)
        pmin = jnp.minimum(p * x0, p * (x0 + wt - 1.0))
        for di in range(it):
            i = (itile * it + di).astype(jnp.float32)
            gy = q * i + r + p * xs                       # (wt, 1)
            y0 = jnp.floor(q * i + r + pmin).astype(jnp.int32)
            y0 = jnp.clip(y0, 0, h - K)
            acc = jnp.zeros((wt, c), jnp.float32)
            for k in range(K):
                yk = (y0 + k).astype(jnp.float32)
                wk = jnp.maximum(1.0 - jnp.abs(gy - yk), 0.0)  # (wt, 1)
                slab = img_ref[0, y0 + k].astype(jnp.float32)  # (wt, c)
                acc = acc + wk * slab
            out_ref[0, di] = acc.astype(out_ref.dtype)

    def banded_build(i_outer: bool):
        if i_outer:
            grid = (b, h // it, w // wt)
            imap_in = lambda bb, ii, xw: (bb, 0, xw, 0)      # noqa: E731
            imap_out = lambda bb, ii, xw: (bb, ii, xw, 0)    # noqa: E731
            itile_dim, xtile_dim = 1, 2
        else:
            grid = (b, w // wt, h // it)
            imap_in = lambda bb, xw, ii: (bb, 0, xw, 0)      # noqa: E731
            imap_out = lambda bb, xw, ii: (bb, ii, xw, 0)    # noqa: E731
            itile_dim, xtile_dim = 2, 1
        return jax.jit(pl.pallas_call(
            functools.partial(_banded_kernel, itile_dim=itile_dim,
                              xtile_dim=xtile_dim),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, h, wt, c), imap_in),
            ],
            out_specs=pl.BlockSpec((1, it, wt, c), imap_out),
            out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        ))

    def banded_check(out):
        # oracle: banded blend on host for sample 0, channel 0
        im0 = np.asarray(img[0, :, :, 0], np.float32)     # (H, W)
        want = np.zeros((h, w), np.float32)
        for xw in range(w // wt):
            x0 = xw * wt
            xs = np.arange(x0, x0 + wt)
            pmin = min(p_c * x0, p_c * (x0 + wt - 1.0))
            for i in range(h):
                gy = q_c * i + r_c + p_c * xs             # (wt,)
                base = int(np.clip(np.floor(q_c * i + r_c + pmin),
                                   0, h - K))
                for k in range(K):
                    wk = np.maximum(1.0 - np.abs(gy - (base + k)), 0.0)
                    want[i, x0:x0 + wt] += wk * im0[base + k, x0:x0 + wt]
        got = np.asarray(out[0, :, :, 0], np.float32)
        return np.max(np.abs(got - want))

    attempt("p2_banded_blend", lambda: banded_build(False), coefs, img,
            check=banded_check)
    attempt("p2b_banded_blend_iouter", lambda: banded_build(True),
            coefs, img, check=banded_check)

    # ---- p4: simple fori_loop with a dot ------------------------------
    def _p4_kernel(img_ref, out_ref):
        mh = jnp.maximum(
            1.0 - jnp.abs(
                jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
                .astype(jnp.float32)
                - jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
                .astype(jnp.float32)), 0.0).astype(jnp.bfloat16)

        def body(y, _):
            row = img_ref[0, y]                           # (W, C)
            o = jax.lax.dot_general(
                mh, row, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, y] = o.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, it, body, 0)

    attempt("p4_fori_dot", lambda: jax.jit(pl.pallas_call(
        _p4_kernel,
        grid=(b, h // it),
        in_specs=[pl.BlockSpec((1, it, w, c), lambda bb, ii: (bb, ii, 0, 0))],
        out_specs=pl.BlockSpec((1, it, w, c), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
    )), img)

    # ---- p6: H pass on NHWC rows, pre-transposed tent ------------------
    def _p6_kernel(coef_ref, img_ref, out_ref):
        bb = pl.program_id(0)
        itile = pl.program_id(1)
        q = coef_ref[bb, 0]
        r = coef_ref[bb, 1]
        # tent built directly as (Wo=j rows, W=x cols)
        js_r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(
            jnp.float32)
        xs_c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1).astype(
            jnp.float32)
        for dy in range(it):
            i = (itile * it + dy).astype(jnp.float32)
            mh = jnp.maximum(
                1.0 - jnp.abs(q * js_r + 0.001 * i + r - xs_c),
                0.0).astype(jnp.bfloat16)                 # (Wo, W)
            row = img_ref[0, dy]                          # (W, C)
            o = jax.lax.dot_general(
                mh, row, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (Wo, C)
            out_ref[0, dy] = o.astype(out_ref.dtype)

    def p6_check(out):
        js = np.arange(w, dtype=np.float64)[:, None]
        xs = np.arange(w, dtype=np.float64)[None, :]
        got = np.asarray(out[0, :, :, 0], np.float32)
        err = 0.0
        im0 = np.asarray(img[0], np.float32)              # (H, W, C)
        for i in range(0, h, 37):
            mh = np.maximum(1.0 - np.abs(q_c * js + 0.001 * i + r_c - xs),
                            0.0)
            want = mh @ im0[i, :, 0]
            err = max(err, float(np.max(np.abs(got[i] - want))))
        return err

    attempt("p6_hpass_nhwc", lambda: jax.jit(pl.pallas_call(
        _p6_kernel,
        grid=(b, h // it),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, it, w, c), lambda bb, ii: (bb, ii, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, it, w, c), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
    )), coefs, img, check=p6_check)

    # ---- p6b: same contraction expressed as ((0,),(0,)) ----------------
    def _p6b_kernel(coef_ref, img_ref, out_ref):
        bb = pl.program_id(0)
        itile = pl.program_id(1)
        q = coef_ref[bb, 0]
        r = coef_ref[bb, 1]
        xs_r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(
            jnp.float32)
        js_c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1).astype(
            jnp.float32)
        for dy in range(it):
            i = (itile * it + dy).astype(jnp.float32)
            mh = jnp.maximum(
                1.0 - jnp.abs(q * js_c + 0.001 * i + r - xs_r),
                0.0).astype(jnp.bfloat16)                 # (W, Wo)
            row = img_ref[0, dy]                          # (W, C)
            o = jax.lax.dot_general(
                mh, row, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (Wo, C)
            out_ref[0, dy] = o.astype(out_ref.dtype)

    attempt("p6b_hpass_c0", lambda: jax.jit(pl.pallas_call(
        _p6b_kernel,
        grid=(b, h // it),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, it, w, c), lambda bb, ii: (bb, ii, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, it, w, c), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
    )), coefs, img, check=p6_check)

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

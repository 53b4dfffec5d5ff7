#!/usr/bin/env python
"""On-chip probe: TPU-friendly lowerings of the CBAM spatial gate.

`probe_attention.py` measured the 7x7 conv over the 2-channel
[avg;max] map at ~5.5 ms fwd+bwd in the flagship step: with
C_in=2/C_out=1 the conv fills 1/128 MXU output lanes, so XLA's conv
emitter runs ~240 MFLOP at <0.1% of peak. This probe times
mathematically-identical reformulations of the whole gate-apply
(y = x * sigmoid(conv7x7([avg;max]))), fwd and fwd+bwd w.r.t. both x
and the filter:

  conv      shipped lax.conv (NHWC, HWIO)                [baseline]
  stencil   explicit 98-tap shifted-slice FMA (pure elementwise
            fusion -> VPU, no conv emitter)
  toeplitz  width-in-lanes GEMM: stack 7 vertically shifted copies of
            each channel into the contraction dim and multiply by a
            block-Toeplitz (14*Wp, W) matrix built from the filter via
            a constant one-hot basis (the affine-warp trick)

Shapes: the flagship geometry CBAM sites that matter (finest decoder
level dominates). Usage: python scripts/probe_sa_lowering.py [out.json]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

K = 7
PAD = K // 2


def make_fns(H, W, dtype):
    import jax
    import jax.numpy as jnp
    from jax import lax

    Wp = W + 2 * PAD

    def pooled(x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        return jnp.concatenate([avg, mx], axis=-1)  # (B,H,W,2)

    def gate_conv(x, w):
        att = lax.conv_general_dilated(
            pooled(x).astype(dtype), w.astype(dtype), (1, 1),
            [(PAD, PAD), (PAD, PAD)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x * jax.nn.sigmoid(att)

    def gate_stencil(x, w):
        p = pooled(x).astype(dtype)
        w = w.astype(dtype)
        p = jnp.pad(p, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
        att = jnp.zeros(x.shape[:3], dtype)
        for dy in range(K):
            for dx in range(K):
                sl = p[:, dy:dy + H, dx:dx + W, :]
                att = att + sl[..., 0] * w[dy, dx, 0, 0] \
                          + sl[..., 1] * w[dy, dx, 1, 0]
        return x * jax.nn.sigmoid(att)[..., None]

    # constant one-hot basis: basis[kx, wp, w] = 1 iff wp == w + kx
    wp_idx = np.arange(Wp)[None, :, None]
    w_idx = np.arange(W)[None, None, :]
    kx_idx = np.arange(K)[:, None, None]
    basis = (wp_idx == w_idx + kx_idx)

    def gate_toeplitz(x, w):
        b = jnp.asarray(basis, dtype)
        p = pooled(x).astype(dtype)
        w = w.astype(dtype)
        p = jnp.pad(p, ((0, 0), (0, 0), (PAD, PAD), (0, 0)))  # (B,H,Wp,2)
        p = jnp.pad(p, ((0, 0), (PAD, PAD), (0, 0), (0, 0)))  # (B,Hp,Wp,2)
        # stack the 7 vertical shifts of both channels into one axis
        rows = jnp.stack(
            [p[:, ky:ky + H, :, c] for ky in range(K) for c in range(2)],
            axis=2)  # (B,H,14,Wp)
        # T[ky*2+c, wp, w] = sum_kx w[ky,kx,c] * basis[kx,wp,w]
        t = jnp.einsum("kxc,xpw->kcpw", w[..., 0], b).reshape(2 * K, Wp, W)
        att = jnp.einsum("bhsp,spw->bhw", rows, t)
        return x * jax.nn.sigmoid(att)[..., None]

    return {"conv": gate_conv, "stencil": gate_stencil,
            "toeplitz": gate_toeplitz}


def _fence(out):
    # hard sync via a ONE-ELEMENT device->host readback (reading the whole
    # output over the tunnel costs seconds; block_until_ready lies here)
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])


def timeit(fn, args, steps=30, windows=2):
    _fence(fn(*args))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        o = None
        for _ in range(steps):
            o = fn(*args)
        _fence(o)
        best = min(best, (time.perf_counter() - t0) / steps * 1e3)
    return best


def main():
    import jax
    import jax.numpy as jnp

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sa_lowering.json"
    results = {}
    sites = [(16, 240, 320, 64), (16, 120, 160, 128), (16, 60, 80, 256)]
    for B, H, W, C in sites:
        key = f"{B}x{H}x{W}x{C}"
        results[key] = {}
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, K, 2, 1)) * 0.1, jnp.float32)
        cot = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        fns = make_fns(H, W, jnp.bfloat16)
        ref_fn = None
        for name, fn in fns.items():
            fwd = jax.jit(fn)
            if ref_fn is None:
                ref_fn = fn
            # parity vs the conv path, reduced ON DEVICE (full readback
            # over the tunnel costs ~9 s per variant)
            diff = jax.jit(lambda x, w, f=fn: (
                jnp.max(jnp.abs(f(x, w).astype(jnp.float32)
                                - ref_fn(x, w).astype(jnp.float32))),
                jnp.max(jnp.abs(ref_fn(x, w).astype(jnp.float32)))))
            dmax, rmax = diff(x, w)
            err = float(dmax) / (float(rmax) + 1e-9)

            def loss(x, w, fn=fn):
                return (fn(x, w).astype(jnp.float32) * cot).sum()

            gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))
            fwd_ms = timeit(fwd, (x, w))
            bwd_ms = timeit(gfn, (x, w))
            results[key][name] = {
                "fwd_ms": round(fwd_ms, 3), "grad_ms": round(bwd_ms, 3),
                "rel_err_vs_conv": round(err, 8)}
            print(key, name, results[key][name], flush=True)
            json.dump(results, open(out_path, "w"), indent=2)


if __name__ == "__main__":
    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    main()

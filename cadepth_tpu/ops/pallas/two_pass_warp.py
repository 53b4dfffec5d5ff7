"""Pallas TPU kernel: the two-pass GEMM affine warp, tents built in VMEM.

Mosaic-friendly reformulation of :func:`cadepth_tpu.ops.affine_warp.
two_pass_affine_warp` (the PCL production warp, `pcl_layer.h:97-110`
semantics). Identical algebra — vertical pass against the sheared tent
``g(x, i)``, horizontal pass against ``h(j, i)`` — but the per-column /
per-row tent matrices are generated INSIDE the kernel from iota math and
consumed immediately by an MXU dot, so:

* the (B, W, H, Ho) + (B, Ho, W, Wo) tent matrices never exist in HBM
  (the XLA version moves ~6 GB/step of them at b16 geometry, and its
  round-3 layout study showed another 1.26 GB of XLA relayout copies
  per conv-warp-conv block that no einsum formulation or layout
  constraint removes — PERF_NOTES.md);
* operand layouts are fixed by the kernel's BlockSpecs — there is
  nothing for the XLA dot emitter to relayout.

Construct budget (deliberate): NO manual DMA, NO ``fori_loop``, NO
in-loop dynamic slicing — only ``broadcasted_iota`` arithmetic, static
Python-unrolled loops, and one ``dot_general`` per unrolled step. The
round-1 banded kernel (`ops/pallas/affine_warp.py`) crashes the remote
Mosaic compiler on its DMA + fori_loop + matmul composition; this
kernel stays inside the subset that compiled standalone in those
probes.

STATUS: forward-only (serving / eval path). Interpret-mode parity with
``two_pass_affine_warp`` is tested in tests/test_pallas.py; on-chip
compilation gated on the remote Mosaic compiler (HTTP-500s on round-3
probes — see PERF_NOTES).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadepth_tpu.ops.affine_warp import affine_pixel_coeffs


def _tile(n: int, pref: int = 8) -> int:
    """Largest divisor of ``n`` that is <= pref (static unroll factor)."""
    for t in range(min(pref, n), 0, -1):
        if n % t == 0:
            return t
    return 1


def _pass_v_kernel(coef_ref, img_ref, out_ref, *, height: int, width: int,
                   xt: int, border: bool, mat_bf16: bool):
    """V[i, x, c] = sum_y tent(g(x, i) - y) * img[y, x, c] for one
    (batch, x-tile) grid cell. One (Ho, H) @ (H, C) dot per column."""
    b = pl.program_id(0)
    xtile = pl.program_id(1)

    a = coef_ref[b, 0]
    bb = coef_ref[b, 1]
    c = coef_ref[b, 2]
    d = coef_ref[b, 3]
    e = coef_ref[b, 4]
    f = coef_ref[b, 5]
    a_safe = jnp.where(jnp.abs(a) < 1e-3,
                       jnp.where(a < 0, -1e-3, 1e-3), a)
    doa = d / a_safe

    iis = jax.lax.broadcasted_iota(jnp.float32, (height, 1), 0)   # i (rows)
    ys = jax.lax.broadcasted_iota(jnp.float32, (1, height), 1)    # y (cols)

    for dx in range(xt):
        x = (xtile * xt + dx).astype(jnp.float32)
        # g(x, i) = (D/A) x + (E - D B/A) i + (F - D C/A)
        g = doa * x + (e - doa * bb) * iis + (f - doa * c)   # (Ho, 1)
        if border:
            g = jnp.clip(g, 0.0, height - 1.0)
        mv = jnp.maximum(1.0 - jnp.abs(g - ys), 0.0)         # (Ho, H)
        if mat_bf16:
            mv = mv.astype(jnp.bfloat16)
        col = img_ref[0, :, dx, :]                           # (H, C)
        v = jax.lax.dot_general(
            mv, col, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Ho, C)
        out_ref[0, :, dx, :] = v.astype(out_ref.dtype)


def _pass_h_kernel(coef_ref, v_ref, out_ref, *, height: int, width: int,
                   it: int, border: bool, mat_bf16: bool):
    """out[i, j, c] = sum_x tent(h(j, i) - x) * V[i, x, c] for one
    (batch, i-tile) grid cell. One (Wo, W) @ (W, C) dot per row."""
    b = pl.program_id(0)
    itile = pl.program_id(1)

    a = coef_ref[b, 0]
    bb = coef_ref[b, 1]
    c = coef_ref[b, 2]

    js = jax.lax.broadcasted_iota(jnp.float32, (width, 1), 0)    # j (rows)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, width), 1)    # x (cols)

    for di in range(it):
        i = (itile * it + di).astype(jnp.float32)
        # h(j, i) = A j + B i + C
        h = a * js + bb * i + c                              # (Wo, 1)
        if border:
            h = jnp.clip(h, 0.0, width - 1.0)
        mh = jnp.maximum(1.0 - jnp.abs(h - xs), 0.0)         # (Wo, W)
        if mat_bf16:
            mh = mh.astype(jnp.bfloat16)
        row = v_ref[0, di, :, :]                             # (W, C)
        o = jax.lax.dot_general(
            mh, row, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Wo, C)
        out_ref[0, di, :, :] = o.astype(out_ref.dtype)


def pallas_two_pass_warp(img: jax.Array, theta: jax.Array,
                         padding_mode: str = "zeros",
                         align_corners: bool = False,
                         interpret: bool = False) -> jax.Array:
    """Two-pass GEMM affine warp with in-kernel tent generation.

    Same semantics (incl. the sheared first-pass kernel under rotation)
    as :func:`~cadepth_tpu.ops.affine_warp.two_pass_affine_warp`.

    Args:
      img: (B, H, W, C) features, NHWC.
      theta: (B, 2, 3) torch-convention affine matrices.
      padding_mode: "zeros" | "border".
      align_corners: torch flag (PCL uses False).
      interpret: run in Pallas interpret mode (CPU testing).

    Returns:
      (B, H, W, C), dtype of ``img``. Forward only — no VJP.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")
    bsz, h, w, ch = img.shape
    border = padding_mode == "border"
    mat_bf16 = img.dtype not in (jnp.float32, jnp.float64)

    coefs = jnp.stack(affine_pixel_coeffs(theta, h, w, align_corners),
                      axis=-1)                               # (B, 6)

    xt = _tile(w)
    v = pl.pallas_call(
        functools.partial(_pass_v_kernel, height=h, width=w, xt=xt,
                          border=border, mat_bf16=mat_bf16),
        grid=(bsz, w // xt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, h, xt, ch), lambda b, x: (b, 0, x, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, xt, ch), lambda b, x: (b, 0, x, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, ch), img.dtype),
        interpret=interpret,
    )(coefs, img)

    it = _tile(h)
    out = pl.pallas_call(
        functools.partial(_pass_h_kernel, height=h, width=w, it=it,
                          border=border, mat_bf16=mat_bf16),
        grid=(bsz, h // it),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, it, w, ch), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, it, w, ch), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, ch), img.dtype),
        interpret=interpret,
    )(coefs, v)
    return out

"""Pallas TPU kernel: fused masked depth-loss statistics.

The SILog and reprojection losses (`depth_loss.h:20-69, 255-355`) share
the same inputs, the same validity mask, and the same reduction
structure. The stock XLA path reads pred/gt several times (log-diff
sums, squared sums, back-projection error); this kernel computes all
four statistics in ONE pass over the depth maps on the VPU:

    sum_d    = sum over valid of (log pred - log gt)
    sum_d2   = sum over valid of (log pred - log gt)^2
    count    = number of valid pixels
    sum_rep  = sum over valid of || backproj(pred) - backproj(gt) ||

A custom VJP makes the whole fused loss differentiable: the backward is
elementwise and runs as a second Pallas kernel, so neither direction
materializes intermediates in HBM.

Measured on a v5e chip (16x240x320 fp32): this kernel runs the fused
forward in ~0.50 ms vs ~0.37 ms for the stock jnp losses — XLA's own
fusion already saturates this reduction, so the default loss path stays
on XLA and this kernel is an optional, numerically-identical drop-in
(and the scaffold for future kernels targeting ops XLA fuses poorly,
e.g. the PCL gather backward).

Both kernels tile (B, H, W) maps to (block_h, W_pad) VMEM blocks with
lane padding masked out; per-sample camera scalars ride along as SMEM
operands via PrefetchScalarGridSpec-style small refs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6
_CLAMP_MAX = 1000.0
_LANES = 128


def _pad_width(w: int) -> int:
    return ((w + _LANES - 1) // _LANES) * _LANES


def _stats_kernel(k4_ref, pred_ref, gt_ref, out_ref, *, width: int,
                  block_h: int, eps: float):
    """Grid cell = (batch b, row-block i). Accumulates 4 partial sums."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    pred = pred_ref[...]  # (1, block_h, W_pad) f32
    gt = gt_ref[...]

    # validity: gt > eps AND inside the unpadded width.
    # Block shape is (1, block_h, W_pad): dim 1 = image rows, dim 2 = cols.
    col = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 2)
    in_bounds = col < width
    mask = (gt > eps) & in_bounds
    maskf = mask.astype(jnp.float32)

    d = jnp.log(jnp.clip(pred, eps, _CLAMP_MAX)) - jnp.log(
        jnp.clip(gt, eps, _CLAMP_MAX))
    d = d * maskf

    fx = k4_ref[b, 0]
    fy = k4_ref[b, 1]
    cx = k4_ref[b, 2]
    cy = k4_ref[b, 3]
    u = col.astype(jnp.float32)
    row0 = i * block_h
    v = (jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
         + row0).astype(jnp.float32)
    xs = (u - cx) / (fx + eps)
    ys = (v - cy) / (fy + eps)
    diff = pred - gt
    rep = jnp.sqrt(
        (xs * diff) ** 2 + (ys * diff) ** 2 + diff * diff + eps) * maskf

    # out_ref is the WHOLE (B, n_blocks, 4) SMEM array; each grid cell
    # writes its own slot (full-array SMEM sidesteps the min-tile rule).
    out_ref[b, i, 0] = jnp.sum(d)
    out_ref[b, i, 1] = jnp.sum(d * d)
    out_ref[b, i, 2] = jnp.sum(maskf)
    out_ref[b, i, 3] = jnp.sum(rep)


def _grad_kernel(k4_ref, pred_ref, gt_ref, coef_ref, dpred_ref, *,
                 width: int, block_h: int, eps: float):
    """Elementwise backward for the four fused statistics.

    coef = (c_sum_d, c_sum_d2, c_sum_rep) upstream cotangents already
    divided through by the caller (count factors folded in there).
    d/dpred sum_d   = 1/pred            (within clamp range)
    d/dpred sum_d2  = 2*d/pred
    d/dpred sum_rep = (xs^2 + ys^2 + 1) * diff / rep_unmasked
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    pred = pred_ref[...]
    gt = gt_ref[...]

    col = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 2)
    in_bounds = col < width
    mask = (gt > eps) & in_bounds
    maskf = mask.astype(jnp.float32)

    pred_c = jnp.clip(pred, eps, _CLAMP_MAX)
    gt_c = jnp.clip(gt, eps, _CLAMP_MAX)
    d = jnp.log(pred_c) - jnp.log(gt_c)
    in_clamp = ((pred > eps) & (pred < _CLAMP_MAX)).astype(jnp.float32)
    inv_pred = in_clamp / pred_c

    fx = k4_ref[b, 0]
    fy = k4_ref[b, 1]
    cx = k4_ref[b, 2]
    cy = k4_ref[b, 3]
    u = col.astype(jnp.float32)
    row0 = i * block_h
    v = (jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
         + row0).astype(jnp.float32)
    xs = (u - cx) / (fx + eps)
    ys = (v - cy) / (fy + eps)
    diff = pred - gt
    geom = xs * xs + ys * ys + 1.0
    rep = jnp.sqrt(geom * diff * diff + eps)
    drep = geom * diff / rep

    c_d = coef_ref[0, 0]
    c_d2 = coef_ref[0, 1]
    c_rep = coef_ref[0, 2]
    dpred_ref[...] = maskf * (
        c_d * inv_pred + c_d2 * 2.0 * d * inv_pred + c_rep * drep)


def _choose_block_h(height: int) -> int:
    # caller pads H to a multiple of 64 (or 8 for small maps), so pick the
    # largest block that divides it — fewer grid programs = faster Mosaic
    # compile and less per-step overhead.
    for cand in (256, 128, 64, 32, 16, 8):
        if height % cand == 0:
            return cand
    return 8


def _pad_hw(pred, gt, h, w):
    """Pad to (64k or 8k, 128m); padded gt is 0 so padded pixels are masked."""
    unit = 64 if h >= 64 else 8
    h_pad = ((h + unit - 1) // unit) * unit
    w_pad = _pad_width(w)
    if (h_pad, w_pad) != (h, w):
        pad = ((0, 0), (0, h_pad - h), (0, w_pad - w))
        pred = jnp.pad(pred, pad)
        gt = jnp.pad(gt, pad)
    return pred, gt, h_pad, w_pad


def _stats_fwd_impl(pred: jax.Array, gt: jax.Array, k4: jax.Array,
                    interpret: bool = False) -> jax.Array:
    b, h, w = pred.shape
    pred, gt, h_pad, w_pad = _pad_hw(pred, gt, h, w)
    block_h = _choose_block_h(h_pad)
    grid = (b, h_pad // block_h)

    partial = pl.pallas_call(
        functools.partial(_stats_kernel, width=w, block_h=block_h, eps=_EPS),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # k4 (B, 4), full
            pl.BlockSpec((1, block_h, w_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, w_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),  # full array
        out_shape=jax.ShapeDtypeStruct((grid[0], grid[1], 4), jnp.float32),
        interpret=interpret,
    )(k4, pred, gt)
    return jnp.sum(partial, axis=(0, 1))


def _grad_impl(pred, gt, k4, coefs, interpret: bool = False):
    b, h, w = pred.shape
    pred_p, gt_p, h_pad, w_pad = _pad_hw(pred, gt, h, w)
    block_h = _choose_block_h(h_pad)
    grid = (b, h_pad // block_h)

    dpred = pl.pallas_call(
        functools.partial(_grad_kernel, width=w, block_h=block_h, eps=_EPS),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_h, w_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, w_pad), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs (1, 3)
        ],
        out_specs=pl.BlockSpec((1, block_h, w_pad), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32),
        interpret=interpret,
    )(k4, pred_p, gt_p, coefs)
    return dpred[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_depth_loss_stats(pred: jax.Array, gt: jax.Array, k4: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """(B, H, W) pred/gt + (B, 4) [fx, fy, cx, cy] -> 4 fused statistics.

    Returns [sum_d, sum_d2, count, sum_reproj] over valid (gt > eps)
    pixels. Differentiable w.r.t. `pred` only (gt/k4 are data).
    """
    return _stats_fwd_impl(pred.astype(jnp.float32), gt.astype(jnp.float32),
                           k4.astype(jnp.float32), interpret)


def _fused_fwd(pred, gt, k4, interpret):
    stats = _stats_fwd_impl(pred.astype(jnp.float32), gt.astype(jnp.float32),
                            k4.astype(jnp.float32), interpret)
    return stats, (pred, gt, k4)


def _fused_bwd(interpret, residuals, g):
    pred, gt, k4 = residuals
    # g = cotangents for [sum_d, sum_d2, count, sum_rep]; count has no
    # pred-gradient.
    coefs = jnp.reshape(jnp.stack([g[0], g[1], g[3]]), (1, 3)).astype(jnp.float32)
    dpred = _grad_impl(pred.astype(jnp.float32), gt.astype(jnp.float32),
                       k4.astype(jnp.float32), coefs, interpret)
    return dpred.astype(pred.dtype), None, None


fused_depth_loss_stats.defvjp(_fused_fwd, _fused_bwd)


def silog_reproj_losses(pred: jax.Array, gt: jax.Array, k4: jax.Array,
                        lam: float = 0.5,
                        interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """(SILog, reprojection) losses from the fused statistics.

    Matches `scale_invariant_loss` + `reprojection_loss` in
    :mod:`cadepth_tpu.losses.depth_loss` (default gt>eps mask) from one
    pass over the data.

    Accepts (B, H, W, 1) or (B, H, W).
    """
    if pred.ndim == 4:
        pred = pred[..., 0]
        gt = gt[..., 0]
    stats = fused_depth_loss_stats(pred, gt, k4, interpret)
    sum_d, sum_d2, count, sum_rep = stats[0], stats[1], stats[2], stats[3]
    n = jnp.maximum(count, 1.0)
    silog = jnp.where(count > 0, sum_d2 / n - lam * (sum_d * sum_d) / (n * n),
                      0.0)
    reproj = jnp.where(count > 0, sum_rep / n, 0.0)
    return silog, reproj

"""EXPERIMENTAL Pallas TPU kernel: banded affine bilinear warp.

Targets the PCL hot op (SURVEY/PERF_NOTES): `grid_sample` over an
AFFINE grid. XLA TPU gathers run near scalar speed; this kernel
exploits the affine structure instead:

* the source rows needed by one output row span a small vertical band
  (|dv/di|·Wo + 2 rows), DMA'd contiguously per row with a dynamic
  start — no scatter/gather in the y direction;
* the x-gather is decomposed into per-128-lane-tile `dynamic_gather`
  shuffles (the only vector gather the VPU has) with cross-tile
  selection;
* band rows whose tent weights vanish for the whole output row are
  skipped with `pl.when`.

EXACTNESS: matches `grid_sample(img, affine_grid(theta), zeros,
align_corners=False)` bit-for-bf16 PROVIDED the per-row vertical span
fits the static band: |dv/di|·(Wo−1) + 2 ≤ BAND_S. PCL transforms are
identity-initialized and stay near identity, so the default band (16)
covers rotations to ~2.5° at Wo=320; callers must check
:func:`max_rotation_rows` or keep the XLA path (the PCL module does —
this kernel is NOT wired in yet; forward-only, no VJP).

STATUS (round 1): correct in interpret mode across identity / zoom /
rotation / out-of-bounds cases (tests/test_pallas.py), but the
tunneled remote Mosaic compiler on this stack (jax 0.9 / libtpu
0.0.34) crashes (HTTP 500, compile-helper subprocess exit 1) on the
composition of manual dynamic-offset DMA + fori_loop + in-loop
matmuls, even though each construct compiles alone. Revisit with a
newer toolchain or local compile dumps in round 2; until then the XLA
gather path stays the production route.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BAND_S = 16     # static vertical band (multiple of 8)
CTILE = 16      # channel sublane tile (bf16 min tile)


def _pixel_coeffs(theta: jax.Array, h: int, w: int) -> Tuple[jax.Array, ...]:
    """theta (B,2,3) normalized-affine -> pixel-space u/v coefficients.

    u(j,i) = ax*i + bx*j + cx ; v(j,i) = ay*i + by*j + cy, with torch
    align_corners=False conventions (see ops/grid_sample.affine_grid).
    """
    t = theta.astype(jnp.float32)
    ax = t[:, 0, 0] * w / w
    bx = t[:, 0, 1] * w / h
    cx = ((t[:, 0, 0] * (1 / w - 1) + t[:, 0, 1] * (1 / h - 1)
           + t[:, 0, 2] + 1) * w - 1) / 2
    ay = t[:, 1, 0] * h / w
    by = t[:, 1, 1] * h / h
    cy = ((t[:, 1, 0] * (1 / w - 1) + t[:, 1, 1] * (1 / h - 1)
           + t[:, 1, 2] + 1) * h - 1) / 2
    return ax, bx, cx, ay, by, cy


def max_rotation_rows(theta: jax.Array, h: int, w: int) -> jax.Array:
    """Per-batch vertical span (rows) one output row's samples cover.

    The kernel is exact iff this + 2 <= BAND_S for every batch element.
    """
    ay = _pixel_coeffs(theta, h, w)[3]
    return jnp.abs(ay) * (w - 1)


def _warp_kernel(coef_ref, ystart_ref, img_ref, out_ref, band, acc_ref, sem,
                 *, height: int, width: int, w_pad: int, band_s: int,
                 ctile: int):
    b = pl.program_id(0)
    ct = pl.program_id(1)
    j = pl.program_id(2)

    ys = ystart_ref[b, j]
    dma = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(ct * ctile, ctile), pl.ds(ys + band_s, band_s), :],
        band, sem)
    dma.start()

    ax = coef_ref[b, 0]
    bx = coef_ref[b, 1]
    cx = coef_ref[b, 2]
    ay = coef_ref[b, 3]
    by = coef_ref[b, 4]
    cy = coef_ref[b, 5]

    jf = j.astype(jnp.float32)
    o = jax.lax.broadcasted_iota(jnp.int32, (1, w_pad), 1).astype(jnp.float32)
    u = ax * o + bx * jf + cx          # (1, Wp) source x positions
    v = ay * o + by * jf + cy          # (1, Wp) source y positions

    x0 = jnp.floor(u)
    wx1 = u - x0
    in_out = o < width                  # lane padding mask
    corners = [(x0, 1.0 - wx1), (x0 + 1.0, wx1)]

    dma.wait()

    # per-(o, src-column) one-hot matmuls: gather-as-MXU-contraction
    # (exact for bf16 data: values multiply exact 0/1 weights).
    src_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    # only the rows the tent kernel touches contribute:
    # v in [ys, ys + span], span = |ay|*(Wo-1) + 2
    vmax = jnp.maximum(v[0, 0], ay * (width - 1) + by * jf + cy)
    s_hi = jnp.minimum(
        (jnp.ceil(vmax).astype(jnp.int32) - ys) + 2, band_s)

    def body(s, acc):
        ysf = (ys + s).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(v - ysf))       # (1, Wp)
        wy = jnp.where(in_out, wy, 0.0)
        row = band[:, pl.ds(s, 1), :][:, 0, :]               # (ctile, Wp)
        for xc, wxc in corners:
            xi = xc.astype(jnp.int32)                        # (1, Wp)
            ok = (xc >= 0) & (xc <= width - 1)
            wcol = jnp.where(ok, wxc * wy, 0.0)              # (1, Wp)
            tiles = []
            for ot in range(w_pad // LANES):
                sl = slice(ot * LANES, (ot + 1) * LANES)
                it = xi[:, sl]                               # (1, 128)
                wc = wcol[:, sl]                             # (1, 128)
                tile_acc = jnp.zeros((ctile, LANES), jnp.float32)
                for st in range(w_pad // LANES):
                    # M[src, o] = (it[o] == src_global) * wcol[o]
                    onehot = (it - st * LANES == src_iota)
                    m = onehot.astype(jnp.float32) * wc
                    tile_acc = tile_acc + jax.lax.dot_general(
                        row[:, st * LANES:(st + 1) * LANES]
                        .astype(jnp.float32), m,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                tiles.append(tile_acc)
            acc = acc + (tiles[0] if len(tiles) == 1
                         else jnp.concatenate(tiles, axis=1))
        return acc

    acc = jax.lax.fori_loop(0, s_hi, body,
                            jnp.zeros((ctile, w_pad), jnp.float32))
    acc_ref[...] = acc
    out_ref[...] = acc_ref[...][None, None, :, :].astype(out_ref.dtype)


def pallas_affine_warp(img: jax.Array, theta: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """Affine bilinear warp (zeros padding, align_corners=False).

    img (B, H, W, C), theta (B, 2, 3) -> (B, H, W, C). Forward only,
    no VJP. Exact iff max_rotation_rows(theta) + 2 <= BAND_S.
    """
    b, h, w, c = img.shape
    w_pad = ((w + LANES - 1) // LANES) * LANES
    c_pad = ((c + CTILE - 1) // CTILE) * CTILE

    ax, bx, cx, ay, by, cy = _pixel_coeffs(theta, h, w)
    coefs = jnp.stack([ax, bx, cx, ay, by, cy], axis=-1)  # (B, 6)

    # per output row: band start = floor(min over the row of v)
    j = jnp.arange(h, dtype=jnp.float32)
    v0 = ay[:, None] * 0.0 + by[:, None] * j[None, :] + cy[:, None]
    v1 = ay[:, None] * (w - 1) + by[:, None] * j[None, :] + cy[:, None]
    ystart = jnp.floor(jnp.minimum(v0, v1)).astype(jnp.int32)
    ystart = jnp.clip(ystart, -BAND_S, h + BAND_S - BAND_S)

    # layout: (B, C_pad, H + 2*BAND_S, W_pad), zero padded
    img_t = jnp.transpose(img, (0, 3, 1, 2))
    img_t = jnp.pad(img_t, ((0, 0), (0, c_pad - c),
                            (BAND_S, BAND_S), (0, w_pad - w)))

    out = pl.pallas_call(
        functools.partial(_warp_kernel, height=h, width=w, w_pad=w_pad,
                          band_s=BAND_S, ctile=CTILE),
        grid=(b, c_pad // CTILE, h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # coefs (B, 6)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ystart (B, H)
            pl.BlockSpec(memory_space=pl.ANY),       # img_t, DMA'd manually
        ],
        # output laid out (B, H, C, Wp) so the block's last two dims
        # (CTILE, Wp) satisfy the (8,128) min-tile rule
        out_specs=pl.BlockSpec((1, 1, CTILE, w_pad),
                               lambda bi, ci, ji: (bi, ji, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, c_pad, w_pad), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((CTILE, BAND_S, w_pad), img.dtype),
            pltpu.VMEM((CTILE, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(coefs, ystart, img_t)

    out = out[:, :, :c, :w]                    # (B, H, C, W)
    return jnp.transpose(out, (0, 1, 3, 2))    # -> (B, H, W, C)

"""Pallas TPU kernel: NHWC-native banded two-pass affine warp ("fused").

Third-generation Pallas warp (after `affine_warp.py`, blocked on the
remote Mosaic compiler, and `two_pass_warp.py`, which compiles but
loses in-model). Same algebra as
:func:`cadepth_tpu.ops.affine_warp.two_pass_affine_warp` (the PCL
production warp, `pcl_layer.h:97-110` semantics — vertical pass against
the sheared tent ``g(x, i) = (D/A)x + (E - DB/A)i + (F - DC/A)``, then
horizontal pass against ``h(j, i) = Aj + Bi + C``), with two changes
that attack the measured bottlenecks (PERF_NOTES round-4 warp probes):

1. **NHWC blocks end to end.** `two_pass_warp.py` needs width-major
   (B, W, H, C) operands so its per-column dots see a leading block
   index, costing 2 fwd + 3 bwd activation-sized XLA transposes
   (~2.2 ms EACH at the b16 finest level — more than the V pass
   itself) plus boundary relayouts against the surrounding convs. Here
   the V pass reads the natural (1, H, wt, C) W-strip and writes
   (1, it, wt, C) NHWC tiles directly: zero transposes anywhere, and
   the conv -> warp -> conv neighborhood stays in the convs' preferred
   C-minor layout (the round-3 study showed XLA inserts 1.26 GB of
   relayout copies per finest conv-warp-conv block no matter how the
   XLA einsum is phrased).

2. **Banded V pass on the VPU.** The warp's tent matrix has 2 nonzeros
   per output position; the dense per-column (Ho,H)@(H,C) dots pay for
   all H. Since the learned thetas live near identity (the PCL head is
   identity-initialized; `pcl_max_rot` stays ~1e-2), the source rows
   feeding an (it x wt) output tile form a static-width band: the
   kernel computes the band base with scalar math, reads each band row
   ONCE (`img_ref[0, y0 + k]` — dynamic second-index reads measured
   fine on-chip), and applies per-(row, tap) tent weights as (wt, 1) x
   (wt, C) broadcast FMAs. K-outer/row-inner order keeps dynamic reads
   at ``kb`` per grid cell (the row-outer variant measured 2x slower).
   The input strip is revisited across i-tiles (innermost grid dim), so
   Mosaic's block-delta DMA skip fetches it once per strip (measured
   3.4x on-chip: 5.2 vs 17.9 ms when the revisit dim is outermost).

The H pass and its backward reuse `two_pass_warp.py`'s kernels
verbatim — they are already NHWC-native.

**Validity regime.** The band has static width ``kb``; thetas whose
vertical footprint exceeds it truncate taps silently. With defaults
(it=8, kb_fwd=it+8, kb_bwd=2*it+8) the kernel is EXACT vs ``two_pass``
for per-batch ``|q| = |E - DB/A|`` in ~[0.56, 1.5] and ``|D/A| <= 0.05``
— generous around the PCL's near-identity regime (monitored via
``pcl_max_rot``); :func:`fused_warp_theta_ok` computes the exact
predicate for dispatch/tests. ``zeros`` padding only: ``border``
clamping makes edge rows' adjoint support unbounded, which a static
band cannot represent (callers fall back to ``two_pass``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadepth_tpu.ops.affine_warp import affine_pixel_coeffs
from cadepth_tpu.ops.pallas.two_pass_warp import (
    _bwd_h_kernel,
    _dtent,
    _fiota,
    _pass_h_kernel,
    _scalar_lanes,
    _tile,
)


def _fused_tiles(h: int, w: int):
    """(it, wt, kb_fwd, kb_bwd) tile/band sizes for an (h, w) level.

    it: output-row tile (divisor of h, pref 4 — the band is it+8 rows,
    so a smaller tile wastes fewer taps: it=4 does 48 tap-iterations
    per cell where it=8 does 128, and covers MORE zoom: q <= 2.2 vs
    1.54); wt: W strip (divisor of w, pref 64 — the largest strip whose
    shear footprint stays well inside the band at the 0.05 rot bound);
    kb: static band heights, clamped to h (clamped == dense == exact at
    tiny levels)."""
    it = _tile(h, int(os.environ.get("CADEPTH_FUSED_WARP_IT", "4")))
    wt = _tile(w, int(os.environ.get("CADEPTH_FUSED_WARP_WT", "64")))
    kb_f = min(it + 8, h)
    kb_b = min(2 * it + 8, h)
    return it, wt, kb_f, kb_b


def _g_coeffs(coef_ref, b):
    """Scalars (doa, q, r0) of g(x, i) = doa*x + q*i + r0 from SMEM."""
    a = coef_ref[b, 0]
    bb = coef_ref[b, 1]
    c = coef_ref[b, 2]
    d = coef_ref[b, 3]
    e = coef_ref[b, 4]
    f = coef_ref[b, 5]
    a_safe = jnp.where(jnp.abs(a) < 1e-3,
                       jnp.where(a < 0, -1e-3, 1e-3), a)
    doa = d / a_safe
    return doa, e - doa * bb, f - doa * c


def _corner_extrema(v00, v01, v10, v11):
    lo = jnp.minimum(jnp.minimum(v00, v01), jnp.minimum(v10, v11))
    hi = jnp.maximum(jnp.maximum(v00, v01), jnp.maximum(v10, v11))
    return lo, hi


def _fwd_v_banded_kernel(coef_ref, img_ref, out_ref, *, height: int,
                         it: int, wt: int, kb: int, mat_bf16: bool):
    """Banded V pass for one (batch, W-strip, i-tile) grid cell.

    V[i, x, c] = sum_y tent(g(x, i) - y) * img[y, x, c], y restricted
    to the kb-row band [y0, y0 + kb) whose base is computed from the
    cell's corner extrema of g (exact whenever the band covers the tent
    support — see `fused_warp_theta_ok`).
    """
    b = pl.program_id(0)
    xw = pl.program_id(1)
    ii = pl.program_id(2)
    doa, q, r0 = _g_coeffs(coef_ref, b)

    x0 = (xw * wt).astype(jnp.float32)
    i0 = (ii * it).astype(jnp.float32)
    xs = _fiota((wt, 1), 0) + x0                         # x down sublanes

    g00 = doa * x0 + q * i0 + r0
    g01 = doa * (x0 + wt - 1.0) + q * i0 + r0
    g10 = doa * x0 + q * (i0 + it - 1.0) + r0
    g11 = doa * (x0 + wt - 1.0) + q * (i0 + it - 1.0) + r0
    gmin, _ = _corner_extrema(g00, g01, g10, g11)
    y0 = jnp.clip(jnp.floor(gmin).astype(jnp.int32), 0, height - kb)

    accs = [jnp.zeros((wt, out_ref.shape[-1]), jnp.float32)
            for _ in range(it)]
    for k in range(kb):
        slab = img_ref[0, y0 + k].astype(jnp.float32)    # (wt, C)
        yk = (y0 + k).astype(jnp.float32)
        gx = doa * xs + (r0 - yk)                        # (wt, 1)
        for di in range(it):
            wk = jnp.maximum(1.0 - jnp.abs(gx + q * (i0 + di)), 0.0)
            if mat_bf16:
                wk = wk.astype(jnp.bfloat16).astype(jnp.float32)
            accs[di] = accs[di] + wk * slab
    for di in range(it):
        out_ref[0, di] = accs[di].astype(out_ref.dtype)


def _bwd_v_banded_kernel(coef_ref, dv_ref, img_ref, dimg_ref, pqr_ref, *,
                         height: int, it: int, wt: int, kb: int,
                         mat_bf16: bool):
    """Banded transposed V pass + g-coefficient partials for one
    (batch, W-strip, y-tile) grid cell.

    d_img[y, x, c] = sum_i tent(g(x, i) - y) * d_v[i, x, c], i
    restricted to the kb-row band around (y - r0 - doa*x)/q;
    pqr += sum (d_v * img) * dtent * (x, i, 1)  [doa-, q-, r0-partials,
    chained through affine_pixel_coeffs outside like two_pass_warp.py].
    """
    b = pl.program_id(0)
    xw = pl.program_id(1)
    yi = pl.program_id(2)
    doa, q, r0 = _g_coeffs(coef_ref, b)
    q_safe = jnp.where(jnp.abs(q) < 1e-3,
                       jnp.where(q < 0, -1e-3, 1e-3), q)

    x0 = (xw * wt).astype(jnp.float32)
    y_lo = (yi * it).astype(jnp.float32)
    xs = _fiota((wt, 1), 0) + x0                         # x down sublanes

    # i-band from the corner extrema of t = y - r0 - doa*x over the
    # cell; tent support is i in [(t - 1)/q, (t + 1)/q] (either order).
    t00 = y_lo - r0 - doa * x0
    t01 = y_lo - r0 - doa * (x0 + wt - 1.0)
    t10 = y_lo + it - 1.0 - r0 - doa * x0
    t11 = y_lo + it - 1.0 - r0 - doa * (x0 + wt - 1.0)
    t_lo, t_hi = _corner_extrema(t00, t01, t10, t11)
    u1 = (t_lo - 1.0) / q_safe
    u2 = (t_lo + 1.0) / q_safe
    u3 = (t_hi - 1.0) / q_safe
    u4 = (t_hi + 1.0) / q_safe
    u_lo, _ = _corner_extrema(u1, u2, u3, u4)
    i0 = jnp.clip(jnp.floor(u_lo).astype(jnp.int32), 0, height - kb)

    # Vector accumulators; the cross-lane reductions happen ONCE at the
    # end (three jnp.sum's per inner iteration measured 3x slower than
    # the XLA backward — reduction hoisting is the difference between a
    # 27 ms and a single-digit-ms backward at the finest level).
    # s_r = sum(acc_r); s_p = sum(acc_r * xs) since xs is constant per
    # cell; s_q needs the per-tap ikf weight, so a second accumulator
    # integrates contrib * ikf (ikf is a scalar — one fused
    # multiply-add per tap, not a reduction).
    daccs = [jnp.zeros((wt, dimg_ref.shape[-1]), jnp.float32)
             for _ in range(it)]
    acc_r = jnp.zeros((wt, dimg_ref.shape[-1]), jnp.float32)
    acc_q = jnp.zeros((wt, dimg_ref.shape[-1]), jnp.float32)
    img_rows = [img_ref[0, dy].astype(jnp.float32) for dy in range(it)]
    for k in range(kb):
        dv_slab = dv_ref[0, i0 + k].astype(jnp.float32)  # (wt, C)
        ikf = (i0 + k).astype(jnp.float32)
        gx = doa * xs + (q * ikf + r0)                   # (wt, 1)
        c_k = jnp.zeros((wt, dimg_ref.shape[-1]), jnp.float32)
        for dy in range(it):
            diff = gx - (y_lo + dy)                      # (wt, 1)
            wk = jnp.maximum(1.0 - jnp.abs(diff), 0.0)
            if mat_bf16:
                wk = wk.astype(jnp.bfloat16).astype(jnp.float32)
            daccs[dy] = daccs[dy] + wk * dv_slab
            c_k = c_k + img_rows[dy] * _dtent(diff)      # (wt, C)
        contrib_k = dv_slab * c_k
        acc_r = acc_r + contrib_k
        acc_q = acc_q + ikf * contrib_k
    for dy in range(it):
        dimg_ref[0, dy] = daccs[dy].astype(dimg_ref.dtype)

    s_r = jnp.sum(acc_r)
    s_p = jnp.sum(acc_r * xs)
    s_q = jnp.sum(acc_q)
    vec = _scalar_lanes(s_p, s_q, s_r)

    @pl.when((xw == 0) & (yi == 0))
    def _init():
        pqr_ref[0] = vec

    @pl.when((xw != 0) | (yi != 0))
    def _acc():
        pqr_ref[0] = pqr_ref[0] + vec


def fused_warp_theta_ok(theta: jax.Array, height: int, width: int,
                        align_corners: bool = False) -> jax.Array:
    """Per-batch bool: does the static band cover this theta exactly?

    Forward band: |q|(it-1) + |doa|(wt-1) + 2 <= kb_fwd - 1 (floor
    slack). Backward band: (t-span + 2)/|q| + 2 <= kb_bwd - 1 with
    t-span = (it-1) + |doa|(wt-1). Inside this predicate the fused warp
    matches ``two_pass_affine_warp`` (forward AND gradients) to
    accumulation-order rounding; outside it taps truncate silently —
    mirror of the two_pass rotation caveat, checked the same way.
    """
    it, wt, kb_f, kb_b = _fused_tiles(height, width)
    a, b, c, d, e, f = affine_pixel_coeffs(theta, height, width,
                                           align_corners)
    a_safe = jnp.where(jnp.abs(a) < 1e-3, jnp.where(a < 0, -1e-3, 1e-3), a)
    doa = jnp.abs(d / a_safe)
    q = jnp.abs(e - (d / a_safe) * b)
    fwd_ok = (q * (it - 1) + doa * (wt - 1) + 2.0) <= (kb_f - 1.0)
    span = (it - 1.0) + doa * (wt - 1)
    bwd_ok = (span + 2.0) / jnp.maximum(q, 1e-3) + 2.0 <= (kb_b - 1.0)
    dense_f = kb_f >= height
    dense_b = kb_b >= height
    return (fwd_ok | dense_f) & (bwd_ok | dense_b)


def _fused_fwd_passes(img, theta, padding_mode, align_corners, interpret):
    if padding_mode != "zeros":
        raise ValueError(
            "pallas_fused_warp supports only padding_mode='zeros' (the "
            "PCL path); border clamping makes the banded adjoint "
            f"unbounded at edges. Got: {padding_mode}")
    bsz, h, w, ch = img.shape
    mat_bf16 = img.dtype not in (jnp.float32, jnp.float64)
    it, wt, kb_f, _ = _fused_tiles(h, w)

    coefs = jnp.stack(affine_pixel_coeffs(theta, h, w, align_corners),
                      axis=-1)                               # (B, 6)

    v = pl.pallas_call(
        functools.partial(_fwd_v_banded_kernel, height=h, it=it, wt=wt,
                          kb=kb_f, mat_bf16=mat_bf16),
        grid=(bsz, w // wt, h // it),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, h, wt, ch), lambda b, x, i: (b, 0, x, 0)),
        ],
        out_specs=pl.BlockSpec((1, it, wt, ch),
                               lambda b, x, i: (b, i, x, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, ch), img.dtype),
        interpret=interpret,
    )(coefs, img)

    ht = _tile(h)
    out = pl.pallas_call(
        functools.partial(_pass_h_kernel, height=h, width=w, it=ht,
                          border=False, mat_bf16=mat_bf16),
        grid=(bsz, h // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, ht, w, ch), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ht, w, ch), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, ch), img.dtype),
        interpret=interpret,
    )(coefs, v)
    return out, v


def pallas_fused_warp(img: jax.Array, theta: jax.Array,
                      padding_mode: str = "zeros",
                      align_corners: bool = False,
                      interpret: bool = False) -> jax.Array:
    """NHWC-native banded two-pass affine warp (forward only, no VJP).

    Args:
      img: (B, H, W, C) features, NHWC.
      theta: (B, 2, 3) torch-convention affine matrices (must satisfy
        :func:`fused_warp_theta_ok` for exactness).
      padding_mode: "zeros" only.
      align_corners: torch flag (PCL uses False).
      interpret: run in Pallas interpret mode (CPU testing).
    """
    out, _ = _fused_fwd_passes(img, theta, padding_mode, align_corners,
                               interpret)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_fused_warp_trainable(
        img: jax.Array, theta: jax.Array, padding_mode: str = "zeros",
        align_corners: bool = False, interpret: bool = False) -> jax.Array:
    """:func:`pallas_fused_warp` with a banded NHWC Pallas backward.

    Gradients match the XLA ``two_pass_affine_warp`` custom VJP inside
    the :func:`fused_warp_theta_ok` regime (same tent algebra and kink
    conventions; theta partials accumulated in-kernel, chained through
    ``affine_pixel_coeffs`` outside)."""
    out, _ = _fused_fwd_passes(img, theta, padding_mode, align_corners,
                               interpret)
    return out


def _fused_trainable_fwd(img, theta, padding_mode, align_corners,
                         interpret):
    out, v = _fused_fwd_passes(img, theta, padding_mode, align_corners,
                               interpret)
    return out, (img, v, theta)


def _fused_trainable_bwd(padding_mode, align_corners, interpret,
                         residuals, g):
    img, v, theta = residuals
    bsz, h, w, ch = img.shape
    mat_bf16 = img.dtype not in (jnp.float32, jnp.float64)

    coefs = jnp.stack(affine_pixel_coeffs(theta, h, w, align_corners),
                      axis=-1)

    ht = _tile(h)
    d_v, habc = pl.pallas_call(
        functools.partial(_bwd_h_kernel, height=h, width=w, it=ht,
                          border=False),
        grid=(bsz, h // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, ht, w, ch), lambda b, i: (b, i, 0, 0)),  # g
            pl.BlockSpec((1, ht, w, ch), lambda b, i: (b, i, 0, 0)),  # v
        ],
        out_specs=[
            pl.BlockSpec((1, ht, w, ch), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, ch), img.dtype),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(coefs, g, v)

    it, wt, _, kb_b = _fused_tiles(h, w)
    d_img, pqr = pl.pallas_call(
        functools.partial(_bwd_v_banded_kernel, height=h, it=it, wt=wt,
                          kb=kb_b, mat_bf16=mat_bf16),
        grid=(bsz, w // wt, h // it),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, h, wt, ch), lambda b, x, y: (b, 0, x, 0)),
            pl.BlockSpec((1, it, wt, ch), lambda b, x, y: (b, y, x, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, it, wt, ch), lambda b, x, y: (b, y, x, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, x, y: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, ch), img.dtype),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(coefs, d_v, img)

    def _h_abc(th):
        a, b, c, _, _, _ = affine_pixel_coeffs(th, h, w, align_corners)
        return a, b, c

    def _g_pqr(th):
        a, b, c, d, e, f = affine_pixel_coeffs(th, h, w, align_corners)
        a_safe = jnp.where(jnp.abs(a) < 1e-3,
                           jnp.where(a < 0, -1e-3, 1e-3), a)
        doa = d / a_safe
        return doa, e - doa * b, f - doa * c

    _, vjp_h = jax.vjp(_h_abc, theta)
    _, vjp_g = jax.vjp(_g_pqr, theta)
    d_theta = (vjp_h((habc[:, 0, 0], habc[:, 0, 1], habc[:, 0, 2]))[0]
               + vjp_g((pqr[:, 0, 0], pqr[:, 0, 1], pqr[:, 0, 2]))[0])
    return d_img, d_theta.astype(theta.dtype)


pallas_fused_warp_trainable.defvjp(_fused_trainable_fwd,
                                   _fused_trainable_bwd)

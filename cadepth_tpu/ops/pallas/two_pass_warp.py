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

Backward: :func:`pallas_two_pass_warp_trainable` wraps the kernels in a
``jax.custom_vjp``. ``d_img`` is the transposed two-pass (two more
tent-in-VMEM kernels); the theta gradient is accumulated IN-KERNEL as
six per-batch partials w.r.t. the pixel-affine coefficients of ``g``
and ``h`` (the tent derivative is elementwise against the same in-VMEM
difference matrix), then chained through the coefficient maps with a
tiny ``jax.vjp`` outside — the (B, W, H, Ho)-sized ``d_mv`` that the
XLA custom VJP materializes never exists in HBM either.

STATUS: interpret-mode parity with ``two_pass_affine_warp`` (forward
AND grads) is tested in tests/test_pallas.py; on-chip compilation gated
on the remote Mosaic compiler (HTTP-500s on round-3 probes — see
PERF_NOTES).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadepth_tpu.ops.affine_warp import affine_pixel_coeffs


def _fiota(shape, dim: int) -> jax.Array:
    """Float row/col index vector via INTEGER iota + cast.

    Mosaic's `tpu.iota` verifier requires an integer result type (a
    float `broadcasted_iota` fails with "result #0 must be vector of
    integer or index values" — round-4 on-chip probe), so generate
    int32 and convert; XLA/Mosaic fold the cast into the consumer."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32)


def _tile(n: int, pref: int = 0) -> int:
    """Largest divisor of ``n`` <= the preferred static unroll factor.

    Default preference 8; CADEPTH_PALLAS_WARP_TILE=1 gives loop-free
    kernels (one dot per grid cell, more grid steps) — the most
    conservative construct mix for a fragile Mosaic toolchain."""
    import os

    if pref <= 0:
        pref = int(os.environ.get("CADEPTH_PALLAS_WARP_TILE", "8"))
    for t in range(min(pref, n), 0, -1):
        if n % t == 0:
            return t
    return 1


def _pass_v_kernel(coef_ref, img_ref, out_ref, *, height: int, width: int,
                   xt: int, border: bool, mat_bf16: bool):
    """V[x, i, c] = sum_y tent(g(x, i) - y) * imgT[x, y, c] for one
    (batch, x-tile) grid cell. One (Ho, H) @ (H, C) dot per column.

    Operates on the WIDTH-MAJOR transpose (B, W, H, C) of both input
    and output so the per-column scalar index lands in a LEADING block
    dim: Mosaic's vector layout inference rejects shape casts that
    touch the last two (tiled) dims — `(240,64) -> (1,240,1,64)` was
    the round-4 on-chip failure — while leading-singleton squeezes are
    native. The (B,W,H,C)<->(B,H,W,C) transposes happen in XLA outside
    the kernel (~2 copies of the feature map, vs the ~6 GB/step of tent
    matrices the pure-XLA warp materializes at b16 geometry)."""
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

    iis = _fiota((height, 1), 0)   # i (rows)
    ys = _fiota((1, height), 1)    # y (cols)

    for dx in range(xt):
        x = (xtile * xt + dx).astype(jnp.float32)
        # g(x, i) = (D/A) x + (E - D B/A) i + (F - D C/A)
        g = doa * x + (e - doa * bb) * iis + (f - doa * c)   # (Ho, 1)
        if border:
            g = jnp.clip(g, 0.0, height - 1.0)
        mv = jnp.maximum(1.0 - jnp.abs(g - ys), 0.0)         # (Ho, H)
        if mat_bf16:
            mv = mv.astype(jnp.bfloat16)
        col = img_ref[0, dx, :, :]                           # (H, C)
        v = jax.lax.dot_general(
            mv, col, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Ho, C)
        out_ref[0, dx, :, :] = v.astype(out_ref.dtype)


def _pass_h_kernel(coef_ref, v_ref, out_ref, *, height: int, width: int,
                   it: int, border: bool, mat_bf16: bool):
    """out[i, j, c] = sum_x tent(h(j, i) - x) * V[i, x, c] for one
    (batch, i-tile) grid cell. One (Wo, W) @ (W, C) dot per row."""
    b = pl.program_id(0)
    itile = pl.program_id(1)

    a = coef_ref[b, 0]
    bb = coef_ref[b, 1]
    c = coef_ref[b, 2]

    js = _fiota((width, 1), 0)    # j (rows)
    xs = _fiota((1, width), 1)    # x (cols)

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


def _scalar_lanes(*vals: jax.Array) -> jax.Array:
    """Pack scalars into lanes 0..k-1 of an (8, 128) f32 tile (the
    smallest block whose last two dims satisfy Mosaic's (8, 128)
    divisibility rule for outputs; the host reads row 0)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    for k, v in enumerate(vals):
        out = jnp.where(lane == k, v.astype(jnp.float32), out)
    return out


def _dtent(diff: jax.Array) -> jax.Array:
    """d/dpos of tent(pos - grid) = max(1 - |pos - grid|, 0).

    Matches jax autodiff's kink conventions EXACTLY — they are the
    operating point, not an edge case: the PCL's affine head is
    identity-initialized, so early-training positions land precisely on
    grid integers, where every tap sits at a tent kink. jax uses
    abs'(0) = +1 (so dtent(0) = -1, not 0) and max-tie weight 0.5 at
    |diff| == 1 (so dtent(+-1) = -+0.5). The round-4 parity hunt found
    the naive `-sign(diff) * [|diff| < 1]` convention diverging from
    the XLA custom VJP by up to 100% at identity/axis-aligned thetas
    (exact-kink positions) while matching off-kink to 1e-6."""
    sgn = jnp.where(diff >= 0.0, 1.0, -1.0)        # abs'(0) = +1
    ad = jnp.abs(diff)
    mag = jnp.where(ad < 1.0, 1.0,
                    jnp.where(ad == 1.0, 0.5, 0.0))  # max-tie at kink
    return -sgn * mag


def _dclip(pos: jax.Array, size: int) -> jax.Array:
    """d/dpos of clip(pos, 0, size-1), matching jnp.clip's autodiff:
    1 strictly inside, 0 strictly outside, 0.5 at the exact bounds
    (min/max tie convention — same kink reasoning as `_dtent`)."""
    hi = size - 1.0
    return jnp.where((pos > 0.0) & (pos < hi), 1.0,
                     jnp.where((pos == 0.0) | (pos == hi), 0.5, 0.0))


def _bwd_h_kernel(coef_ref, g_ref, v_ref, dv_ref, habc_ref, *,
                  height: int, width: int, it: int, border: bool):
    """Transposed H pass + theta partials for one (batch, i-tile) cell.

    d_v[i, x, c] = sum_j mh[j, x] * g[i, j, c]
    habc        += sum_{j,x} (g·vᵀ)[j, x] * dtent[j, x] * (j, i, 1)
    """
    b = pl.program_id(0)
    itile = pl.program_id(1)
    a = coef_ref[b, 0]
    bb = coef_ref[b, 1]
    c = coef_ref[b, 2]

    js = _fiota((width, 1), 0)    # j (rows)
    xs = _fiota((1, width), 1)    # x (cols)

    s_a = jnp.float32(0.0)
    s_b = jnp.float32(0.0)
    s_c = jnp.float32(0.0)
    for di in range(it):
        i = (itile * it + di).astype(jnp.float32)
        h = a * js + bb * i + c                              # (Wo, 1)
        hp = jnp.clip(h, 0.0, width - 1.0) if border else h
        diff = hp - xs                                       # (Wo, W)
        mh = jnp.maximum(1.0 - jnp.abs(diff), 0.0)
        g_i = g_ref[0, di, :, :].astype(jnp.float32)         # (Wo, C)
        v_i = v_ref[0, di, :, :].astype(jnp.float32)         # (W, C)
        d_v = jax.lax.dot_general(
            mh, g_i, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (W, C)
        dv_ref[0, di, :, :] = d_v.astype(dv_ref.dtype)
        d_mh = jax.lax.dot_general(
            g_i, v_i, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Wo, W)
        contrib = d_mh * _dtent(diff)
        if border:
            contrib = contrib * _dclip(h, width)
        s_a = s_a + jnp.sum(contrib * js)
        s_b = s_b + i * jnp.sum(contrib)
        s_c = s_c + jnp.sum(contrib)

    vec = _scalar_lanes(s_a, s_b, s_c)

    @pl.when(itile == 0)
    def _init():
        habc_ref[0] = vec

    @pl.when(itile != 0)
    def _acc():
        habc_ref[0] = habc_ref[0] + vec


def _bwd_v_kernel(coef_ref, dv_ref, img_ref, dimg_ref, pqr_ref, *,
                  height: int, width: int, xt: int, border: bool):
    """Transposed V pass + g-coefficient partials for one
    (batch, x-tile) cell. Width-major (B, W, ·, C) operands/output for
    the same Mosaic leading-dim rule as `_pass_v_kernel`.

    d_img[x, y, c] = sum_i mv[i, y] * d_v[x, i, c]
    pqr           += sum_{i,y} (d_v·imgᵀ)[i, y] * dtent[i, y] * (x, i, 1)
    """
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

    iis = _fiota((height, 1), 0)  # i (rows)
    ys = _fiota((1, height), 1)   # y (cols)

    s_p = jnp.float32(0.0)
    s_q = jnp.float32(0.0)
    s_r = jnp.float32(0.0)
    for dx in range(xt):
        x = (xtile * xt + dx).astype(jnp.float32)
        g = doa * x + (e - doa * bb) * iis + (f - doa * c)   # (Ho, 1)
        gp = jnp.clip(g, 0.0, height - 1.0) if border else g
        diff = gp - ys                                       # (Ho, H)
        mv = jnp.maximum(1.0 - jnp.abs(diff), 0.0)
        dv_x = dv_ref[0, dx, :, :].astype(jnp.float32)       # (Ho, C)
        img_x = img_ref[0, dx, :, :].astype(jnp.float32)     # (H, C)
        d_img = jax.lax.dot_general(
            mv, dv_x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (H, C)
        dimg_ref[0, dx, :, :] = d_img.astype(dimg_ref.dtype)
        d_mv = jax.lax.dot_general(
            dv_x, img_x, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Ho, H)
        contrib = d_mv * _dtent(diff)
        if border:
            contrib = contrib * _dclip(g, height)
        s_p = s_p + x * jnp.sum(contrib)
        s_q = s_q + jnp.sum(contrib * iis)
        s_r = s_r + jnp.sum(contrib)

    vec = _scalar_lanes(s_p, s_q, s_r)

    @pl.when(xtile == 0)
    def _init():
        pqr_ref[0] = vec

    @pl.when(xtile != 0)
    def _acc():
        pqr_ref[0] = pqr_ref[0] + vec


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
    out, _ = _pallas_warp_fwd_passes(img, theta, padding_mode,
                                     align_corners, interpret)
    return out


def _pallas_warp_fwd_passes(img, theta, padding_mode, align_corners,
                            interpret):
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")
    bsz, h, w, ch = img.shape
    border = padding_mode == "border"
    mat_bf16 = img.dtype not in (jnp.float32, jnp.float64)

    coefs = jnp.stack(affine_pixel_coeffs(theta, h, w, align_corners),
                      axis=-1)                               # (B, 6)

    xt = _tile(w)
    img_t = jnp.transpose(img, (0, 2, 1, 3))                 # (B, W, H, C)
    v_t = pl.pallas_call(
        functools.partial(_pass_v_kernel, height=h, width=w, xt=xt,
                          border=border, mat_bf16=mat_bf16),
        grid=(bsz, w // xt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, xt, h, ch), lambda b, x: (b, x, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, xt, h, ch), lambda b, x: (b, x, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, w, h, ch), img.dtype),
        interpret=interpret,
    )(coefs, img_t)
    v = jnp.transpose(v_t, (0, 2, 1, 3))                     # (B, Ho, W, C)

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
    return out, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_two_pass_warp_trainable(
        img: jax.Array, theta: jax.Array, padding_mode: str = "zeros",
        align_corners: bool = False, interpret: bool = False) -> jax.Array:
    """:func:`pallas_two_pass_warp` with a Pallas backward.

    Gradients match the XLA ``two_pass_affine_warp`` custom VJP (same
    tent algebra; theta partials accumulated in-kernel against the six
    pixel-affine coefficients, then chained through
    ``affine_pixel_coeffs`` outside)."""
    out, _ = _pallas_warp_fwd_passes(img, theta, padding_mode,
                                     align_corners, interpret)
    return out


def _trainable_fwd(img, theta, padding_mode, align_corners, interpret):
    out, v = _pallas_warp_fwd_passes(img, theta, padding_mode,
                                     align_corners, interpret)
    return out, (img, v, theta)


def _trainable_bwd(padding_mode, align_corners, interpret, residuals, g):
    img, v, theta = residuals
    bsz, h, w, ch = img.shape
    border = padding_mode == "border"

    coefs = jnp.stack(affine_pixel_coeffs(theta, h, w, align_corners),
                      axis=-1)

    it = _tile(h)
    d_v, habc = pl.pallas_call(
        functools.partial(_bwd_h_kernel, height=h, width=w, it=it,
                          border=border),
        grid=(bsz, h // it),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, it, w, ch), lambda b, i: (b, i, 0, 0)),  # g
            pl.BlockSpec((1, it, w, ch), lambda b, i: (b, i, 0, 0)),  # v
        ],
        out_specs=[
            pl.BlockSpec((1, it, w, ch), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0)),  # accumulated
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, ch), img.dtype),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(coefs, g, v)

    xt = _tile(w)
    dv_t = jnp.transpose(d_v, (0, 2, 1, 3))                  # (B, W, Ho, C)
    img_t = jnp.transpose(img, (0, 2, 1, 3))                 # (B, W, H, C)
    d_img_t, pqr = pl.pallas_call(
        functools.partial(_bwd_v_kernel, height=h, width=w, xt=xt,
                          border=border),
        grid=(bsz, w // xt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # coefs
            pl.BlockSpec((1, xt, h, ch), lambda b, x: (b, x, 0, 0)),  # d_v
            pl.BlockSpec((1, xt, h, ch), lambda b, x: (b, x, 0, 0)),  # img
        ],
        out_specs=[
            pl.BlockSpec((1, xt, h, ch), lambda b, x: (b, x, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda b, x: (b, 0, 0)),  # accumulated
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, w, h, ch), img.dtype),
            jax.ShapeDtypeStruct((bsz, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(coefs, dv_t, img_t)
    d_img = jnp.transpose(d_img_t, (0, 2, 1, 3))             # (B, H, W, C)

    # chain the six per-batch coefficient partials back to theta: the
    # coefficient maps are tiny elementwise functions of theta
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
    # accumulators are (B, 8, 128) tiles with the scalars in row 0
    d_theta = (vjp_h((habc[:, 0, 0], habc[:, 0, 1], habc[:, 0, 2]))[0]
               + vjp_g((pqr[:, 0, 0], pqr[:, 0, 1], pqr[:, 0, 2]))[0])
    return d_img, d_theta.astype(theta.dtype)


pallas_two_pass_warp_trainable.defvjp(_trainable_fwd, _trainable_bwd)

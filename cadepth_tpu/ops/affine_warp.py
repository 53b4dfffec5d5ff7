"""Gather-free affine warping as two batched GEMM resampling passes.

TPU-native replacement for the gather-based ``grid_sample`` on the PCL
hot path (`pcl_layer.h:97-110`: ``affine_grid`` + bilinear
``grid_sample``). XLA TPU gathers run near scalar-unit speed and their
backward is a scatter-add (measured in PERF_NOTES.md); this module
reformulates the affine bilinear warp so the data never moves through a
gather:

  out[i, j] = sum_y sum_x tent(py(i,j) - y) * tent(px(i,j) - x) * img[y, x]

with ``px = A j + B i + C`` and ``py = D j + E i + F`` affine in the
output coordinates. Catmull-Smith decomposition (vertical pass, then
horizontal pass):

  V(x, i)   = sum_y tent(g(x,i) - y) * img[y, x]
  out(i, j) = sum_x tent(h(j,i) - x) * V(x, i)

with ``h(j,i) = A j + B i + C`` and
``g(x,i) = (D/A) x + (E - D B/A) i + (F - D C/A)``. Both passes are
einsums contracting against dense tent-weight matrices (2 nonzeros per
output position) — MXU work, and the backward is transposed matmuls
plus elementwise tent derivatives; no scatters anywhere.

Exactness: for ``D = 0`` (zero rotation; scale/shear/translate are all
free) the decomposition reproduces the direct bilinear warp exactly —
``g`` loses its x-dependence and the composite kernel is the separable
2D tent. For ``D != 0`` the first-pass kernel is sheared by ``|D/A|``
(sub-pixel for small rotations): each contributing source row is
sampled at the x-position of that *row* instead of the interpolated
position, displacing the kernel by at most ``|D/A|`` pixels. Callers
gate on a rotation bound and fall back to the exact gather path
(:func:`cadepth_tpu.ops.grid_sample.grid_sample`) outside it.

Layout engineering (round 2): a TPU ``dot_general`` wants its batch
dimensions leading, so naive einsum forms made XLA materialize full
activation transposes around every pass — ~5.7 GB/step of pure copies
in the b16 geometry model. The implementation therefore (a) transposes
explicitly ONCE per pass into batch-leading form (the tent matrices,
being fusion-generated, are free to build in any layout), and (b)
carries a custom VJP whose backward einsums are likewise all
batch-leading — 4 activation-sized copies per warp (2 fwd + 2 bwd)
instead of the ~10-16 autodiff produced.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


def affine_pixel_coeffs(
    theta: jax.Array, height: int, width: int, align_corners: bool = False
) -> Tuple[jax.Array, ...]:
    """Pixel-space coefficients (A..F) of a torch-convention affine grid.

    ``theta`` is (B, 2, 3) acting on normalized output coords (x, y) in
    [-1, 1] (torch ``affine_grid`` convention, see
    :func:`cadepth_tpu.ops.grid_sample.affine_grid`); the source
    position of output pixel (row i, col j) in *pixel* units is

      px = A j + B i + C,   py = D j + E i + F

    Returns six (B,) f32 arrays. Output size == input size (the PCL
    warps feature maps onto themselves).
    """
    t = theta.astype(jnp.float32)
    h, w = float(height), float(width)
    if align_corners:
        # gx(j) = 2j/(W-1) - 1; px = (nx + 1)/2 * (W-1)
        a = t[:, 0, 0]
        b = t[:, 0, 1] * (w - 1.0) / (h - 1.0)
        c = (w - 1.0) / 2.0 * (-t[:, 0, 0] - t[:, 0, 1] + t[:, 0, 2] + 1.0)
        d = t[:, 1, 0] * (h - 1.0) / (w - 1.0)
        e = t[:, 1, 1]
        f = (h - 1.0) / 2.0 * (-t[:, 1, 0] - t[:, 1, 1] + t[:, 1, 2] + 1.0)
    else:
        # gx(j) = (2j+1)/W - 1; px = ((nx + 1) W - 1)/2
        a = t[:, 0, 0]
        b = t[:, 0, 1] * w / h
        c = (w / 2.0) * (t[:, 0, 0] * (1.0 / w - 1.0)
                         + t[:, 0, 1] * (1.0 / h - 1.0)
                         + t[:, 0, 2] + 1.0) - 0.5
        d = t[:, 1, 0] * h / w
        e = t[:, 1, 1]
        f = (h / 2.0) * (t[:, 1, 0] * (1.0 / w - 1.0)
                         + t[:, 1, 1] * (1.0 / h - 1.0)
                         + t[:, 1, 2] + 1.0) - 0.5
    return a, b, c, d, e, f


def _tent(pos: jax.Array, size: int, padding_mode: str,
          axis_dtype: Any) -> jax.Array:
    """Tent (linear interpolation) weights of ``pos`` against 0..size-1.

    pos: (..., ) positions in pixel units; returns (..., size) weights.
    zeros padding: out-of-range taps contribute nothing (weights already
    vanish outside [-1, size]); border: clamp the position first, which
    reproduces torch's clip-then-interpolate edge behavior.
    """
    if padding_mode == "border":
        pos = jnp.clip(pos, 0.0, size - 1.0)
    elif padding_mode != "zeros":
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")
    grid = jnp.arange(size, dtype=jnp.float32)
    w = jnp.maximum(1.0 - jnp.abs(pos[..., None] - grid), 0.0)
    return w.astype(axis_dtype)


def _mat_dtype(img_dtype) -> Any:
    # Tent weights in the compute dtype of the data: bf16 weights against
    # bf16 features lose nothing material (weight rounding ~2^-9 relative,
    # on par with bf16 data precision); f32 runs stay f32 end-to-end.
    return img_dtype if img_dtype in (jnp.float32, jnp.float64) \
        else jnp.bfloat16


def _build_mv(theta, height, width, padding_mode, align_corners, dtype):
    """Pass-V tent matrix, batch-leading layout (B, x:W, y:H, i:Ho)."""
    a, b, c, d, e, f = affine_pixel_coeffs(theta, height, width,
                                           align_corners)
    a_safe = jnp.where(jnp.abs(a) < 1e-3, jnp.where(a < 0, -1e-3, 1e-3), a)
    doa = d / a_safe
    xs = jnp.arange(width, dtype=jnp.float32)
    iis = jnp.arange(height, dtype=jnp.float32)
    # g(x, i) = (D/A) x + (E - D B/A) i + (F - D C/A)
    g = (doa[:, None, None] * xs[None, :, None]
         + (e - doa * b)[:, None, None] * iis[None, None, :]
         + (f - doa * c)[:, None, None])                  # (B, W, Ho)
    mv = _tent(g, height, padding_mode, dtype)            # (B, W, Ho, H)
    return mv.swapaxes(2, 3)                              # (B, W, H, Ho)


def _build_mh(theta, height, width, padding_mode, align_corners, dtype):
    """Pass-H tent matrix, batch-leading layout (B, i:Ho, x:W, j:Wo)."""
    a, b, c, _, _, _ = affine_pixel_coeffs(theta, height, width,
                                           align_corners)
    js = jnp.arange(width, dtype=jnp.float32)
    iis = jnp.arange(height, dtype=jnp.float32)
    # h(j, i) = A j + B i + C
    hpos = (a[:, None, None] * js[None, None, :]
            + b[:, None, None] * iis[None, :, None]
            + c[:, None, None])                           # (B, Ho, Wo)
    mh = _tent(hpos, width, padding_mode, dtype)          # (B, Ho, Wo, W)
    return mh.swapaxes(2, 3)                              # (B, Ho, W, Wo)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def two_pass_affine_warp(
    img: jax.Array,
    theta: jax.Array,
    padding_mode: str = "zeros",
    align_corners: bool = False,
    precision: Optional[Any] = None,
) -> jax.Array:
    """Warp ``img`` by affine ``theta`` with two gather-free GEMM passes.

    Args:
      img: (B, H, W, C) features.
      theta: (B, 2, 3) affine matrices, torch ``affine_grid`` convention.
      padding_mode: "zeros" or "border".
      align_corners: torch flag (PCL uses False).
      precision: matmul precision override; tests pass "highest" with
        f32 inputs for bit-level comparisons against the gather path.

    Returns:
      (B, H, W, C), same dtype as ``img``.
    """
    out, _ = _warp_fwd(img, theta, padding_mode, align_corners, precision)
    return out


def _warp_fwd(img, theta, padding_mode, align_corners, precision):
    _, h, w, _ = img.shape
    out_dtype = img.dtype
    dt = _mat_dtype(out_dtype)

    img_x = img.swapaxes(1, 2)                            # (B, x, y, c)
    mv = _build_mv(theta, h, w, padding_mode, align_corners, dt)
    # V[b, x, i, c] — batch dims (b, x) leading in both operands
    v = jnp.einsum("bxyc,bxyi->bxic", img_x, mv,
                   precision=precision,
                   preferred_element_type=jnp.float32).astype(dt)
    v_i = v.swapaxes(1, 2)                                # (B, i, x, c)
    mh = _build_mh(theta, h, w, padding_mode, align_corners, dt)
    # out[b, i, j, c] — batch dims (b, i) leading in both operands
    out = jnp.einsum("bixc,bixj->bijc", v_i, mh,
                     precision=precision,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype), (img_x, v_i, theta)


def _warp_bwd(padding_mode, align_corners, precision, residuals, grad):
    img_x, v_i, theta = residuals
    bsz, w, h, _ = img_x.shape  # img_x is (B, x:W, y:H, c)
    out_dtype = img_x.dtype
    dt = _mat_dtype(out_dtype)
    g = grad.astype(dt)

    # Tent matrices are cheap elementwise fusions — rebuild instead of
    # saving 100s of MB of residuals; their theta-gradient comes from
    # jax.vjp over the builders (elementwise, fuses cleanly).
    mv_fn = lambda th: _build_mv(th, h, w, padding_mode, align_corners, dt)
    mh_fn = lambda th: _build_mh(th, h, w, padding_mode, align_corners, dt)
    mv, mv_vjp = jax.vjp(mv_fn, theta)
    mh, mh_vjp = jax.vjp(mh_fn, theta)

    # All einsums below have their batch dims (b,i) or (b,x) leading.
    d_v_i = jnp.einsum("bijc,bixj->bixc", g, mh,
                       precision=precision,
                       preferred_element_type=jnp.float32).astype(dt)
    d_mh = jnp.einsum("bixc,bijc->bixj", v_i.astype(dt), g,
                      precision=precision,
                      preferred_element_type=jnp.float32).astype(dt)
    d_v = d_v_i.swapaxes(1, 2)                            # (B, x, i, c)
    d_img_x = jnp.einsum("bxic,bxyi->bxyc", d_v, mv,
                         precision=precision,
                         preferred_element_type=jnp.float32)
    d_mv = jnp.einsum("bxyc,bxic->bxyi", img_x.astype(dt), d_v,
                      precision=precision,
                      preferred_element_type=jnp.float32).astype(dt)

    d_img = d_img_x.swapaxes(1, 2).astype(out_dtype)      # (B, y, x, c)
    d_theta = (mv_vjp(d_mv)[0] + mh_vjp(d_mh)[0]).astype(theta.dtype)
    return d_img, d_theta


two_pass_affine_warp.defvjp(_warp_fwd, _warp_bwd)


def separable_affine_warp(
    img: jax.Array,
    theta: jax.Array,
    padding_mode: str = "zeros",
    align_corners: bool = False,
    precision: Optional[Any] = None,
) -> jax.Array:
    """Axis-aligned affine warp (scale + translate) as two shared-matrix GEMMs.

    The general :func:`two_pass_affine_warp` builds per-row tent matrices
    — (B, W, H, Ho) and (B, Ho, W, Wo) — whose construction and backward
    materialization dominate the warp's HBM traffic (PERF_NOTES.md:
    ~6 GB/step at b16). When the off-diagonal affine terms vanish
    (rotation = shear = 0 ⇒ ``px = A j + C`` and ``py = E i + F``), the
    sampling position along each axis is independent of the other axis,
    so each pass contracts against ONE (size_out, size_in) tent matrix
    per sample: ~W× (resp. H×) less matrix bandwidth, and each pass is a
    single large MXU-friendly GEMM per sample instead of W (resp. Ho)
    skinny ones.

    Exact (same tent algebra as the direct bilinear warp) iff
    ``theta[:, 0, 1] == 0`` and ``theta[:, 1, 0] == 0``; those terms are
    silently ignored otherwise, displacing samples by up to
    ``|d|·(W-1)`` / ``|b|·(H-1)`` px — callers gate on that bound
    (see `PerspectiveCorrectionLayer.warp_mode`).

    Plain autodiff suffices here: the tent-matrix residuals are tiny
    ((B, H, H) + (B, W, W)) and the theta-gradient matrices likewise, so
    no custom VJP is needed.
    """
    _, h, w, _ = img.shape
    out_dtype = img.dtype
    dt = _mat_dtype(out_dtype)
    a, _, c, _, e, f = affine_pixel_coeffs(theta, h, w, align_corners)
    iis = jnp.arange(h, dtype=jnp.float32)
    js = jnp.arange(w, dtype=jnp.float32)
    py = e[:, None] * iis[None, :] + f[:, None]           # (B, Ho)
    px = a[:, None] * js[None, :] + c[:, None]            # (B, Wo)
    mv = _tent(py, h, padding_mode, dt)                   # (B, Ho, H)
    mh = _tent(px, w, padding_mode, dt)                   # (B, Wo, W)
    v = jnp.einsum("byxc,biy->bixc", img.astype(dt), mv,
                   precision=precision,
                   preferred_element_type=jnp.float32).astype(dt)
    out = jnp.einsum("bixc,bjx->bijc", v, mh,
                     precision=precision,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)

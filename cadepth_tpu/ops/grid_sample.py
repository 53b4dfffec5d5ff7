"""Differentiable bilinear grid sampling + affine grids (NHWC).

XLA has no direct `grid_sample` op; this is a vectorized-gather
implementation matching LibTorch semantics exactly — the hard-parity
requirement for the Perspective Correction Layer (`pcl_layer.h:97-110`
uses align_corners=False + zeros padding; `pcl_layer.h:270-274` uses
align_corners=True + border padding).

Everything is fixed-shape: out-of-bounds handling is done with masks
and clamps, never dynamic shapes, so it jits cleanly on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Map [-1, 1] grid coordinates to pixel coordinates (torch rules)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather img[b, iy, ix, :] for per-batch index maps.

    img: (B, H, W, C); iy/ix: (B, Ho, Wo) int32 already clamped in-range.
    Returns (B, Ho, Wo, C).
    """
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)
    idx = iy * w + ix  # (B, Ho, Wo)
    idx_flat = idx.reshape(b, -1)
    out = jnp.take_along_axis(flat, idx_flat[..., None], axis=1)
    return out.reshape(b, iy.shape[1], iy.shape[2], c)


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """Bilinear sample `img` at `grid` locations (torch grid_sample parity).

    Args:
      img: (B, H, W, C) input feature map.
      grid: (B, Ho, Wo, 2) sampling locations, last dim is (x, y) in
        [-1, 1] (torch convention).
      padding_mode: "zeros" (out-of-range contributions are zero) or
        "border" (clamp to edge).
      align_corners: torch align_corners flag.

    Returns:
      (B, Ho, Wo, C) sampled features.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")
    b, h, w, _ = img.shape
    orig_dtype = img.dtype
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    px = _unnormalize(gx, w, align_corners)
    py = _unnormalize(gy, h, align_corners)

    if padding_mode == "border":
        px = jnp.clip(px, 0.0, w - 1)
        py = jnp.clip(py, 0.0, h - 1)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = px - x0
    wx0 = 1.0 - wx1
    wy1 = py - y0
    wy0 = 1.0 - wy1

    def corner(xi: jax.Array, yi: jax.Array, wgt: jax.Array) -> jax.Array:
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            wgt = jnp.where(valid, wgt, 0.0)
        ix = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        iy = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        # gather in the input dtype (XLA TPU gathers are slow and
        # bandwidth-bound — halving element size matters for bf16), then
        # blend in fp32; values are already bf16 so no precision is lost.
        vals = _gather_2d(img, iy, ix).astype(jnp.float32)
        return vals * wgt[..., None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out.astype(orig_dtype)


def affine_grid(theta: jax.Array, height: int, width: int,
                align_corners: bool = False) -> jax.Array:
    """Generate a (B, height, width, 2) sampling grid from 2x3 affine params.

    Matches torch.affine_grid_generator as used by the PCL
    (`pcl_layer.h:101`): base coordinates span [-1, 1]; with
    align_corners=False the pixel centers sit at (2i+1)/N - 1.
    The last dim of the result is (x, y).
    """
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, width, dtype=jnp.float32)
        ys = jnp.linspace(-1.0, 1.0, height, dtype=jnp.float32)
    else:
        xs = (2.0 * jnp.arange(width, dtype=jnp.float32) + 1.0) / width - 1.0
        ys = (2.0 * jnp.arange(height, dtype=jnp.float32) + 1.0) / height - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    # (B, 2, 3) @ (H, W, 3) -> (B, H, W, 2)
    return jnp.einsum("bij,hwj->bhwi", theta.astype(jnp.float32), base,
                      precision="highest")

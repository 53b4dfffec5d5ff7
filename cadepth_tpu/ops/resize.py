"""Image resizing / pooling with LibTorch-parity semantics, NHWC layout.

The reference resizes RGB/rays with bilinear (align_corners=False) and
depth with nearest (`sunrgbd_loader.cpp:445-477`), and builds loss
pyramids with `avg_pool2d` (`depth_loss.h:106-112`). JAX's
``jax.image.resize`` uses different sampling conventions, so we
implement the exact index rules here — TPU-first: separable bilinear
resize is expressed as two dense interpolation-matrix contractions,
which XLA maps onto the MXU instead of scattered gathers.

All functions take (..., H, W, C) arrays (leading batch dims optional).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) row-interpolation matrix.

    Implements the align_corners=False rule used by
    torch.nn.functional.interpolate: src = (dst + 0.5) * (in/out) - 0.5,
    clamped to the valid range.
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    w_lo = 1.0 - w_hi
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), lo] += w_lo.astype(np.float32)
    mat[np.arange(out_size), hi] += w_hi.astype(np.float32)
    return mat


@functools.lru_cache(maxsize=64)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """Index map for torch's legacy 'nearest' mode: src = floor(dst * in/out)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize (align_corners=False) of (..., H, W, C) to (..., height, width, C).

    Separable: out = M_h @ x @ M_w^T per channel — two matmuls that XLA
    tiles onto the MXU. Matches torch interpolate(mode=bilinear,
    align_corners=False) as used in `sunrgbd_loader.cpp:454-460`.
    """
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (height, width):
        return x
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    m_h = jnp.asarray(_bilinear_matrix(in_h, height))
    m_w = jnp.asarray(_bilinear_matrix(in_w, width))
    # (..., H, W, C): contract H then W.
    # precision="highest" keeps the interpolation exact in fp32 on the MXU
    # (default TPU matmul precision is bf16, which breaks depth parity).
    out = jnp.einsum("oh,...hwc->...owc", m_h, xf, precision="highest")
    out = jnp.einsum("pw,...hwc->...hpc", m_w, out, precision="highest")
    return out.astype(orig_dtype)


def resize_nearest(x: jax.Array, height: int, width: int) -> jax.Array:
    """Nearest-neighbor resize of (..., H, W, C), torch legacy 'nearest' rule.

    Used for depth maps to avoid interpolating across depth
    discontinuities (`sunrgbd_loader.cpp:462-467`).
    """
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (height, width):
        return x
    rows = jnp.asarray(_nearest_indices(in_h, height))
    cols = jnp.asarray(_nearest_indices(in_w, width))
    out = jnp.take(x, rows, axis=-3)
    out = jnp.take(out, cols, axis=-2)
    return out


def avg_pool2d(x: jax.Array, factor: int) -> jax.Array:
    """Average pool with window=stride=factor, floor (drop-remainder) semantics.

    Matches torch avg_pool2d(kernel=f, stride=f) as used for the
    gradient-loss pyramid (`depth_loss.h:106-112`) and ray downsampling
    (`geometry_aware_network.h:387-392`).
    """
    if factor <= 1:
        return x
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = h // factor, w // factor
    x = x[..., : oh * factor, : ow * factor, :]
    shape = x.shape[:-3] + (oh, factor, ow, factor, x.shape[-1])
    return x.reshape(shape).mean(axis=(-4, -2))


def max_pool2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Max pool with window=stride=factor, floor semantics (torch MaxPool2d)."""
    if factor <= 1:
        return x
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = h // factor, w // factor
    x = x[..., : oh * factor, : ow * factor, :]
    shape = x.shape[:-3] + (oh, factor, ow, factor, x.shape[-1])
    return x.reshape(shape).max(axis=(-4, -2))

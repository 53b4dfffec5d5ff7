"""Camera-intrinsics transforms shared across data pipeline and models.

The reference duplicated `normalizeCameraIntrinsics` in three model
headers (`intrinsics_unet.h:252-268`, `geometry_aware_network.h:366-382`,
`:464-471`) and re-derived K rescale/flip/crop math inside the loader
(`sunrgbd_loader.cpp:389-489`). Here it is one shared, jittable module.

All functions accept either a single K or a leading batch dimension.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def k4_from_matrix(intrinsics: jax.Array) -> jax.Array:
    """Extract [fx, fy, cx, cy] from a (..., 3, 3) camera matrix."""
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    return jnp.stack([fx, fy, cx, cy], axis=-1)


def matrix_from_k4(k4: jax.Array) -> jax.Array:
    """Build a (..., 3, 3) camera matrix from [fx, fy, cx, cy]."""
    fx, fy, cx, cy = k4[..., 0], k4[..., 1], k4[..., 2], k4[..., 3]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    rows = [
        jnp.stack([fx, zero, cx], axis=-1),
        jnp.stack([zero, fy, cy], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def normalize_k4(k4: jax.Array, width: int, height: int) -> jax.Array:
    """Scale-invariant conditioning vector used by all camera-aware models.

    [fx/W, fy/H, 2*cx/W - 1, 2*cy/H - 1] — matches the reference's
    `normalizeCameraIntrinsics` (`intrinsics_unet.h:252-268`).
    """
    fx = k4[..., 0] / width
    fy = k4[..., 1] / height
    cx = (k4[..., 2] / width) * 2.0 - 1.0
    cy = (k4[..., 3] / height) * 2.0 - 1.0
    return jnp.stack([fx, fy, cx, cy], axis=-1)


def rescale_intrinsics(intrinsics: jax.Array, scale_x, scale_y) -> jax.Array:
    """Adjust K for an image resize: fx*=sx, fy*=sy, cx*=sx, cy*=sy.

    Mirrors `SunRGBDLoader::resizeSample` K update (`sunrgbd_loader.cpp:479-488`).
    `scale_x`/`scale_y` may be scalars or batched to match leading dims.
    """
    k = jnp.asarray(intrinsics)
    sx = jnp.asarray(scale_x, dtype=k.dtype)
    sy = jnp.asarray(scale_y, dtype=k.dtype)
    scale = jnp.stack(
        [jnp.stack([sx, jnp.ones_like(sx), sx], axis=-1),
         jnp.stack([jnp.ones_like(sy), sy, sy], axis=-1),
         jnp.ones_like(jnp.stack([sx, sx, sx], axis=-1))],
        axis=-2,
    )
    return k * scale


def crop_intrinsics(intrinsics: jax.Array, crop_x, crop_y) -> jax.Array:
    """Adjust K for a top-left crop offset: cx-=crop_x, cy-=crop_y.

    Mirrors `SunRGBDLoader::applyCrop` (`sunrgbd_loader.cpp:409-413`).
    """
    k = jnp.asarray(intrinsics)
    dx = jnp.asarray(crop_x, dtype=k.dtype)
    dy = jnp.asarray(crop_y, dtype=k.dtype)
    offset = jnp.zeros_like(k)
    offset = offset.at[..., 0, 2].set(dx)
    offset = offset.at[..., 1, 2].set(dy)
    return k - offset


def hflip_intrinsics(intrinsics: jax.Array, width) -> jax.Array:
    """Adjust K for a horizontal flip: cx -> W - cx - 1.

    Mirrors `SunRGBDLoader::applyHorizontalFlip` (`sunrgbd_loader.cpp:426-429`).
    """
    k = jnp.asarray(intrinsics)
    w = jnp.asarray(width, dtype=k.dtype)
    new_cx = w - k[..., 0, 2] - 1.0
    return k.at[..., 0, 2].set(new_cx)


def invert_intrinsics(intrinsics: jax.Array) -> jax.Array:
    """Analytic K^-1 for an upper-triangular pinhole matrix.

    Mirrors `RayDirectionComputer::computeInverseIntrinsics`
    (`ray_direction_computer.cpp:276-300`).
    """
    k = jnp.asarray(intrinsics)
    fx = k[..., 0, 0]
    fy = k[..., 1, 1]
    cx = k[..., 0, 2]
    cy = k[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    rows = [
        jnp.stack([1.0 / fx, zero, -cx / fx], axis=-1),
        jnp.stack([zero, 1.0 / fy, -cy / fy], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)

"""Per-pixel camera ray directions, computed on device.

TPU-native replacement for the reference's CPU double loop
(`src/preprocessing/ray_direction_computer.cpp:17-101`): the whole
computation is a closed-form broadcasted expression

    r(u, v) = normalize([ (u - cx) / fx, (v - cy) / fy, 1 ])

that XLA fuses into whatever consumes it, so rays never need to be
precomputed or stored (the `.bin` side channel from the reference is
still supported via :mod:`cadepth_tpu.geometry.io` for CLI parity).

Layout note: this framework is NHWC — ray grids are (H, W, 3) /
(B, H, W, 3), not the reference's (3, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_grid(intrinsics: jax.Array, height: int, width: int,
             dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Unit ray direction for every pixel of an (height, width) image.

    Equivalent to `RayDirectionComputer::computeRayDirectionsMaps`
    (`ray_direction_computer.cpp:64-101`) but vectorized.

    Args:
      intrinsics: (3, 3) camera matrix K.
      height, width: static image dimensions.
      dtype: output dtype.

    Returns:
      (height, width, 3) array of unit rays in camera frame.
    """
    k = intrinsics.astype(jnp.float32)
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    x = (u - cx) / fx
    y = (v - cy) / fy
    z = jnp.ones_like(x)
    rays = jnp.stack([x, y, z], axis=-1)
    inv_norm = jax.lax.rsqrt(jnp.sum(rays * rays, axis=-1, keepdims=True))
    return (rays * inv_norm).astype(dtype)


def ray_grid_batch(intrinsics: jax.Array, height: int, width: int,
                   dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Batched :func:`ray_grid`.

    Args:
      intrinsics: (B, 3, 3) per-sample camera matrices.

    Returns:
      (B, height, width, 3) unit rays.
    """
    return jax.vmap(lambda k: ray_grid(k, height, width, dtype))(intrinsics)


def rays_to_world(rays: jax.Array, pose: jax.Array) -> jax.Array:
    """Rotate camera-frame rays into the world frame: r_world = R @ r.

    Mirrors `RayDirectionComputer::transformRaysToWorld`
    (`ray_direction_computer.cpp:103-127`), including the defensive
    re-normalization.

    Args:
      rays: (..., 3) camera-frame rays.
      pose: (4, 4) or (3, 3) camera-to-world transform; only the
        rotation block is used (rays are directions).

    Returns:
      (..., 3) world-frame unit rays.
    """
    rot = pose[:3, :3].astype(rays.dtype)
    world = jnp.einsum("ij,...j->...i", rot, rays, precision="highest")
    inv_norm = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(world * world, axis=-1, keepdims=True), 1e-12)
    )
    return world * inv_norm


def ray_depth(ray: jax.Array, point: jax.Array) -> jax.Array:
    """Depth of `point` along unit `ray` (dot product).

    Mirrors `RayDirectionComputer::rayDepth` (`ray_direction_computer.cpp:266-272`).
    """
    return jnp.sum(ray * point, axis=-1)

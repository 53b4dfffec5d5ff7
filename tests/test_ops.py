"""Resize / pooling / grid-sample parity against torch CPU as oracle."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cadepth_tpu.ops import (
    resize_bilinear,
    resize_nearest,
    avg_pool2d,
    max_pool2d,
    grid_sample,
    affine_grid,
)


def nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def nchw(a):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(a, -1, 1)))


def test_resize_bilinear_matches_torch(rng):
    x = rng.normal(size=(2, 17, 23, 3)).astype(np.float32)
    for h, w in [(9, 11), (34, 46), (17, 23), (8, 50)]:
        got = np.asarray(resize_bilinear(jnp.asarray(x), h, w))
        want = nhwc(F.interpolate(nchw(x), size=(h, w), mode="bilinear", align_corners=False))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"{h}x{w}")


def test_resize_nearest_matches_torch(rng):
    x = rng.normal(size=(2, 17, 23, 1)).astype(np.float32)
    for h, w in [(9, 11), (34, 46), (13, 29)]:
        got = np.asarray(resize_nearest(jnp.asarray(x), h, w))
        want = nhwc(F.interpolate(nchw(x), size=(h, w), mode="nearest"))
        np.testing.assert_array_equal(got, want, err_msg=f"{h}x{w}")


def test_avg_pool_matches_torch(rng):
    x = rng.normal(size=(2, 19, 27, 3)).astype(np.float32)  # non-divisible dims
    for f in [2, 4, 8]:
        got = np.asarray(avg_pool2d(jnp.asarray(x), f))
        want = nhwc(F.avg_pool2d(nchw(x), kernel_size=f, stride=f))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"factor {f}")


def test_max_pool_matches_torch(rng):
    x = rng.normal(size=(2, 19, 27, 4)).astype(np.float32)
    got = np.asarray(max_pool2d(jnp.asarray(x), 2))
    want = nhwc(F.max_pool2d(nchw(x), kernel_size=2, stride=2))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_grid_sample_zeros_align_false(rng):
    # PCL semantics: bilinear + zeros + align_corners=False (pcl_layer.h:101-108)
    x = rng.normal(size=(2, 14, 18, 5)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, size=(2, 9, 12, 2))).astype(np.float32)
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                 padding_mode="zeros", align_corners=False))
    want = nhwc(F.grid_sample(nchw(x), torch.from_numpy(grid), mode="bilinear",
                              padding_mode="zeros", align_corners=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_border_align_true(rng):
    # Perspective3DTransformer semantics (pcl_layer.h:270-274)
    x = rng.normal(size=(1, 10, 10, 2)).astype(np.float32)
    grid = (rng.uniform(-1.5, 1.5, size=(1, 10, 10, 2))).astype(np.float32)
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                 padding_mode="border", align_corners=True))
    want = nhwc(F.grid_sample(nchw(x), torch.from_numpy(grid), mode="bilinear",
                              padding_mode="border", align_corners=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_affine_grid_matches_torch(rng):
    theta = rng.normal(size=(3, 2, 3)).astype(np.float32)
    h, w = 7, 11
    got = np.asarray(affine_grid(jnp.asarray(theta), h, w, align_corners=False))
    want = F.affine_grid(torch.from_numpy(theta), size=(3, 1, h, w),
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_differentiable():
    import jax

    x = jnp.ones((1, 8, 8, 1))
    grid = jnp.zeros((1, 4, 4, 2))

    def f(g):
        return jnp.sum(grid_sample(x, g))

    grads = jax.grad(f)(grid)
    assert np.all(np.isfinite(np.asarray(grads)))

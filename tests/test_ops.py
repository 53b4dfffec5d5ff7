"""Resize / pooling / grid-sample parity against torch CPU as oracle."""

import numpy as np
import pytest
import jax
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


# -- two-pass gather-free affine warp (ops/affine_warp.py) -------------------

def _pcl_theta(b, sx=1.0, sy=1.0, tx=0.0, ty=0.0, rot=0.0, shear=0.0):
    """Affine theta with the PCL head's layout (pcl_layer.h:152-179)."""
    cos_r, sin_r = np.cos(rot), np.sin(rot)
    th = np.zeros((b, 2, 3), np.float32)
    th[:, 0, 0] = sx * cos_r
    th[:, 0, 1] = -sin_r + shear
    th[:, 0, 2] = tx
    th[:, 1, 0] = sin_r
    th[:, 1, 1] = sy * cos_r
    th[:, 1, 2] = ty
    return jnp.asarray(th)


def _direct_warp(img, theta, pad="zeros"):
    from cadepth_tpu.ops.grid_sample import affine_grid, grid_sample

    g = affine_grid(theta, img.shape[1], img.shape[2], align_corners=False)
    return grid_sample(img, g, padding_mode=pad, align_corners=False)


@pytest.mark.parametrize("pad", ["zeros", "border"])
def test_two_pass_exact_on_rotation_free_subspace(rng, pad):
    """For rot=0 (scale/shear/translate free) the two-pass GEMM warp equals
    direct bilinear grid_sample (the Catmull-Smith shear decomposition is
    exact when the vertical position is independent of the output column)."""
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp

    img = jnp.asarray(rng.normal(size=(2, 24, 32, 5)).astype(np.float32))
    th = _pcl_theta(2, sx=1.12, sy=0.91, tx=0.23, ty=-0.17, shear=0.25)
    want = _direct_warp(img, th, pad)
    got = two_pass_affine_warp(img, th, padding_mode=pad,
                               precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_two_pass_identity_is_identity(rng):
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp

    img = jnp.asarray(rng.normal(size=(1, 16, 20, 3)).astype(np.float32))
    out = two_pass_affine_warp(img, _pcl_theta(1), precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_two_pass_small_rotation_close(rng):
    """Under rotation the first-pass kernel is sheared by |tan rot| pixels;
    for a 1-degree rotation the deviation stays small even on noise."""
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp

    img = jnp.asarray(rng.normal(size=(2, 24, 32, 4)).astype(np.float32))
    th = _pcl_theta(2, sx=1.02, sy=0.98, tx=0.05, rot=np.deg2rad(1.0))
    want = _direct_warp(img, th)
    got = two_pass_affine_warp(img, th, precision="highest")
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.max() < 0.06, err.max()
    assert err.mean() < 0.004, err.mean()


def test_two_pass_gradients_match_gather_on_exact_subspace(rng):
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp

    img = jnp.asarray(rng.normal(size=(2, 16, 20, 3)).astype(np.float32))
    th = _pcl_theta(2, sx=1.07, sy=0.93, tx=0.1, ty=-0.05, shear=0.12)
    cot = jnp.asarray(rng.normal(size=(2, 16, 20, 3)).astype(np.float32))

    g_direct = jax.grad(
        lambda x: jnp.sum(_direct_warp(x, th) * cot))(img)
    g_two = jax.grad(
        lambda x: jnp.sum(two_pass_affine_warp(
            x, th, precision="highest") * cot))(img)
    np.testing.assert_allclose(np.asarray(g_two), np.asarray(g_direct),
                               atol=5e-5)


def test_two_pass_bf16_data(rng):
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp

    img32 = rng.normal(size=(2, 16, 24, 8)).astype(np.float32)
    img = jnp.asarray(img32).astype(jnp.bfloat16)
    th = _pcl_theta(2, sx=1.05, sy=0.97, tx=0.08, shear=0.1)
    got = two_pass_affine_warp(img, th)
    assert got.dtype == jnp.bfloat16
    want = _direct_warp(jnp.asarray(img32), th)
    # bf16 data + bf16 tent weights: ~2^-8 relative agreement
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.03)


# -- separable (axis-aligned) affine warp ------------------------------------

@pytest.mark.parametrize("pad", ["zeros", "border"])
def test_separable_exact_on_axis_aligned_subspace(rng, pad):
    """For rot=shear=0 (scale + translate) the shared-matrix separable warp
    equals direct bilinear grid_sample exactly."""
    from cadepth_tpu.ops.affine_warp import separable_affine_warp

    img = jnp.asarray(rng.normal(size=(2, 24, 32, 5)).astype(np.float32))
    th = _pcl_theta(2, sx=1.12, sy=0.91, tx=0.23, ty=-0.17)
    want = _direct_warp(img, th, pad)
    got = separable_affine_warp(img, th, padding_mode=pad,
                                precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_separable_identity_and_grads(rng):
    from cadepth_tpu.ops.affine_warp import separable_affine_warp

    img = jnp.asarray(rng.normal(size=(1, 16, 20, 3)).astype(np.float32))
    out = separable_affine_warp(img, _pcl_theta(1), precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    th = _pcl_theta(2, sx=1.07, sy=0.93, tx=0.1, ty=-0.05)
    img2 = jnp.asarray(rng.normal(size=(2, 16, 20, 3)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(2, 16, 20, 3)).astype(np.float32))
    g_direct = jax.grad(
        lambda x: jnp.sum(_direct_warp(x, th) * cot))(img2)
    g_sep = jax.grad(
        lambda x: jnp.sum(separable_affine_warp(
            x, th, precision="highest") * cot))(img2)
    np.testing.assert_allclose(np.asarray(g_sep), np.asarray(g_direct),
                               atol=5e-5)

    # theta gradients flow (autodiff through the tent matrices)
    g_th = jax.grad(lambda t: jnp.sum(
        separable_affine_warp(img2, t, precision="highest")))(th)
    assert np.isfinite(np.asarray(g_th)).all()
    assert np.abs(np.asarray(g_th)).max() > 0


def test_separable_tiny_offdiagonal_stays_close(rng):
    """Documented approximation: off-diagonal (rotation/shear) terms only
    displace samples by <= |b|·(H-1) / |d|·(W-1) px, so under the tight
    gate bound the separable warp tracks the direct bilinear warp."""
    from cadepth_tpu.ops.affine_warp import separable_affine_warp

    # smooth image: displacement error scales with the local gradient
    y, x = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 32),
                       indexing="ij")
    img = jnp.asarray(np.stack([x + y, x * y, np.sin(3 * x)], -1)[None]
                      .astype(np.float32))
    # rot such that |d|*(W-1) ~ 0.1 px: d = sin(r)*h/w, W=32, H=24
    th = _pcl_theta(1, sx=1.05, sy=0.95, tx=0.1, ty=-0.05,
                    rot=0.004, shear=0.004)
    want = _direct_warp(img, th)
    got = separable_affine_warp(img, th, precision="highest")
    err = np.abs(np.asarray(got) - np.asarray(want))
    # border rows/cols can flip a tap across the zeros-padding edge (an
    # O(value) effect for ANY sub-pixel approximation); bound the interior
    assert err[:, 1:-1, 1:-1].max() < 0.02, err[:, 1:-1, 1:-1].max()
    assert err.mean() < 0.005, err.mean()

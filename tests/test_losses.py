"""Loss numerics vs. direct numpy ports of the reference formulas (depth_loss.h)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cadepth_tpu.losses import (
    scale_invariant_loss,
    gradient_matching_loss,
    smoothness_loss,
    reprojection_loss,
    CombinedDepthLoss,
)

EPS = 1e-6


def make_data(rng, b=2, h=16, w=24):
    pred = rng.uniform(0.2, 9.0, size=(b, h, w, 1)).astype(np.float32)
    gt = rng.uniform(0.2, 9.0, size=(b, h, w, 1)).astype(np.float32)
    # add invalid (zero-depth) pixels
    gt[gt < 1.0] = 0.0
    img = rng.uniform(0, 1, size=(b, h, w, 3)).astype(np.float32)
    k = np.array([[[300.0, 0, w / 2], [0, 310.0, h / 2], [0, 0, 1]]] * b, np.float32)
    return pred, gt, img, k


def np_silog(pred, gt, lam=0.5):
    """depth_loss.h:33-64"""
    mask = gt > EPS
    p = np.clip(pred, EPS, 1000.0)
    g = np.clip(gt, EPS, 1000.0)
    d = (np.log(p) - np.log(g))[mask]
    n = d.size
    if n == 0:
        return 0.0
    return float((d ** 2).sum() / n - lam * d.sum() ** 2 / (n * n))


def np_avg_pool(x, f):
    b, h, w, c = x.shape
    oh, ow = h // f, w // f
    x = x[:, : oh * f, : ow * f]
    return x.reshape(b, oh, f, ow, f, c).mean(axis=(2, 4))


def np_gradient_loss(pred, gt, num_scales=4):
    """depth_loss.h:95-166 (mask intentionally unused, matching reference)."""
    total = 0.0
    for s in range(num_scales):
        f = 2 ** s
        p = pred if s == 0 else np_avg_pool(pred, f)
        g = gt if s == 0 else np_avg_pool(gt, f)
        p = np.log(np.clip(p, EPS, 1000.0))
        g = np.log(np.clip(g, EPS, 1000.0))
        lx = np.abs((p[:, :, 1:] - p[:, :, :-1]) - (g[:, :, 1:] - g[:, :, :-1])).mean()
        ly = np.abs((p[:, 1:] - p[:, :-1]) - (g[:, 1:] - g[:, :-1])).mean()
        total += lx + ly
    return total / num_scales


def np_smoothness(pred, img):
    """depth_loss.h:189-234"""
    mean = pred.mean(axis=(1, 2), keepdims=True)
    dn = pred / (mean + EPS)
    dgx = np.abs(dn[:, :, 1:] - dn[:, :, :-1])
    dgy = np.abs(dn[:, 1:] - dn[:, :-1])
    igx = np.abs(img[:, :, 1:] - img[:, :, :-1]).mean(axis=-1, keepdims=True)
    igy = np.abs(img[:, 1:] - img[:, :-1]).mean(axis=-1, keepdims=True)
    return float((dgx * np.exp(-igx)).mean() + (dgy * np.exp(-igy)).mean())


def np_reproj(pred, gt, k):
    """depth_loss.h:268-331"""
    b, h, w, _ = pred.shape
    gx = np.arange(w, dtype=np.float32)[None, None, :, None]
    gy = np.arange(h, dtype=np.float32)[None, :, None, None]
    fx = k[:, 0, 0][:, None, None, None]
    fy = k[:, 1, 1][:, None, None, None]
    cx = k[:, 0, 2][:, None, None, None]
    cy = k[:, 1, 2][:, None, None, None]
    px = (gx - cx) * pred / (fx + EPS)
    py = (gy - cy) * pred / (fy + EPS)
    qx = (gx - cx) * gt / (fx + EPS)
    qy = (gy - cy) * gt / (fy + EPS)
    err = np.sqrt((px - qx) ** 2 + (py - qy) ** 2 + (pred - gt) ** 2 + EPS)
    mask = gt > EPS
    if not mask.any():
        return 0.0
    return float(err[mask].mean())


def test_silog_parity(rng):
    pred, gt, _, _ = make_data(rng)
    got = float(scale_invariant_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert got == pytest.approx(np_silog(pred, gt), rel=1e-5)


def test_silog_scale_invariance(rng):
    pred, gt, _, _ = make_data(rng)
    gt = np.clip(gt, 0.5, None)  # fully valid
    base = float(scale_invariant_loss(jnp.asarray(pred), jnp.asarray(gt), lam=1.0))
    scaled = float(scale_invariant_loss(jnp.asarray(pred * 2.0), jnp.asarray(gt), lam=1.0))
    # with lam=1 the SILog loss is invariant to a global scale of pred
    assert scaled == pytest.approx(base, abs=1e-4)


def test_silog_empty_mask():
    z = jnp.zeros((1, 8, 8, 1))
    assert float(scale_invariant_loss(z, z)) == 0.0


def test_gradient_loss_parity(rng):
    pred, gt, _, _ = make_data(rng, h=17, w=29)  # non-divisible for pooling path
    got = float(gradient_matching_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert got == pytest.approx(np_gradient_loss(pred, gt), rel=1e-5)


def test_smoothness_parity(rng):
    pred, _, img, _ = make_data(rng)
    got = float(smoothness_loss(jnp.asarray(pred), jnp.asarray(img)))
    assert got == pytest.approx(np_smoothness(pred, img), rel=1e-5)


def test_reproj_parity(rng):
    pred, gt, _, k = make_data(rng)
    got = float(reprojection_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(k)))
    assert got == pytest.approx(np_reproj(pred, gt, k), rel=1e-5)


def test_reproj_unbatched_k_broadcast(rng):
    pred, gt, _, k = make_data(rng)
    got_b = float(reprojection_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(k)))
    got_s = float(reprojection_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(k[0])))
    assert got_s == pytest.approx(got_b, rel=1e-6)


def test_combined_loss_weights_and_components(rng):
    pred, gt, img, k = make_data(rng)
    loss_fn = CombinedDepthLoss()
    total, comps = loss_fn(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(img), jnp.asarray(k))
    want = (
        1.0 * float(comps["si_loss"])
        + 0.1 * float(comps["grad_loss"])
        + 0.001 * float(comps["smooth_loss"])
        + 0.01 * float(comps["reproj_loss"])
    )
    assert float(total) == pytest.approx(want, rel=1e-6)
    assert float(comps["si_loss"]) == pytest.approx(np_silog(pred, gt), rel=1e-5)
    # without intrinsics there is no reprojection term (depth_loss.h:390-404)
    total2, comps2 = loss_fn(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(img))
    assert "reproj_loss" not in comps2
    assert float(total2) < float(total) + 1e-6


def test_losses_jittable_and_differentiable(rng):
    pred, gt, img, k = make_data(rng, b=1, h=8, w=8)
    loss_fn = CombinedDepthLoss()

    @jax.jit
    def f(p):
        total, _ = loss_fn(p, jnp.asarray(gt), jnp.asarray(img), jnp.asarray(k))
        return total

    g = jax.grad(f)(jnp.asarray(pred))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0

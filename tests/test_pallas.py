"""Pallas fused-loss kernel vs the reference jnp losses (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cadepth_tpu.ops.pallas.fused_loss import (
    fused_depth_loss_stats,
    silog_reproj_losses,
)
from cadepth_tpu.losses import scale_invariant_loss, reprojection_loss
from cadepth_tpu.geometry.intrinsics import matrix_from_k4

INTERPRET = True  # CPU backend in tests; the TPU path is exercised by bench


def make_data(rng, b=2, h=24, w=40):
    # w=40 deliberately not lane-aligned; h=24 divisible by 8
    pred = rng.uniform(0.2, 9.0, size=(b, h, w, 1)).astype(np.float32)
    gt = rng.uniform(0.2, 9.0, size=(b, h, w, 1)).astype(np.float32)
    gt[gt < 1.0] = 0.0
    k4 = np.tile(np.array([[250.0, 260.0, w / 2, h / 2]], np.float32), (b, 1))
    return jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(k4)


def test_fused_losses_match_reference(rng):
    pred, gt, k4 = make_data(rng)
    k = matrix_from_k4(k4)
    si_p, rep_p = silog_reproj_losses(pred, gt, k4, interpret=INTERPRET)
    si_r = scale_invariant_loss(pred, gt)
    rep_r = reprojection_loss(pred, gt, k)
    assert float(si_p) == pytest.approx(float(si_r), rel=1e-5)
    assert float(rep_p) == pytest.approx(float(rep_r), rel=1e-5)


def test_fused_gradient_matches_reference(rng):
    pred, gt, k4 = make_data(rng)
    k = matrix_from_k4(k4)

    def loss_p(p):
        si, rep = silog_reproj_losses(p, gt, k4, interpret=INTERPRET)
        return si + 0.01 * rep

    def loss_r(p):
        return (scale_invariant_loss(p, gt)
                + 0.01 * reprojection_loss(p, gt, k))

    gp = jax.grad(loss_p)(pred)
    gr = jax.grad(loss_r)(pred)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-4, atol=1e-7)


def test_fused_stats_values(rng):
    pred, gt, k4 = make_data(rng)
    stats = np.asarray(fused_depth_loss_stats(
        pred[..., 0], gt[..., 0], k4, INTERPRET))
    g = np.asarray(gt[..., 0])
    p = np.asarray(pred[..., 0])
    mask = g > 1e-6
    d = (np.log(np.clip(p, 1e-6, 1000)) - np.log(np.clip(g, 1e-6, 1000)))[mask]
    assert stats[0] == pytest.approx(d.sum(), rel=1e-4)
    assert stats[1] == pytest.approx((d * d).sum(), rel=1e-4)
    assert stats[2] == mask.sum()


def test_fused_empty_mask():
    z = jnp.zeros((1, 8, 128, 1))
    k4 = jnp.ones((1, 4)) * 100.0
    si, rep = silog_reproj_losses(z, z, k4, interpret=INTERPRET)
    assert float(si) == 0.0
    assert float(rep) == 0.0


def test_fused_odd_height_padding(rng):
    # H=21 not divisible by 8 -> exercises the H-padding path
    pred, gt, k4 = make_data(rng, b=1, h=21, w=30)
    k = matrix_from_k4(k4)
    si_p, rep_p = silog_reproj_losses(pred, gt, k4, interpret=INTERPRET)
    assert float(si_p) == pytest.approx(
        float(scale_invariant_loss(pred, gt)), rel=1e-5)
    assert float(rep_p) == pytest.approx(
        float(reprojection_loss(pred, gt, k)), rel=1e-5)


def test_affine_warp_matches_grid_sample(rng):
    """Experimental banded warp kernel (interpret mode): exact vs the
    torch-parity grid_sample over affine grids within the band bound."""
    from cadepth_tpu.ops.pallas.affine_warp import (
        pallas_affine_warp,
        max_rotation_rows,
    )
    from cadepth_tpu.ops.grid_sample import affine_grid
    from cadepth_tpu.ops import grid_sample

    cases = {
        "identity": np.array([[1, 0, 0], [0, 1, 0.0]]),
        "zoom_shift": np.array([[1.3, 0, 0.2], [0, 0.7, -0.3]]),
        "rotation": np.array([[0.999, -0.037, 0], [0.037, 0.999, 0.0]]),
        "oob_translate": np.array([[1, 0, 0.9], [0, 1, 0.9]]),
    }
    b, h, w, c = 2, 32, 300, 8
    img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    for name, th in cases.items():
        theta = jnp.asarray(np.tile(th[None], (b, 1, 1)).astype(np.float32))
        assert float(max_rotation_rows(theta, h, w).max()) + 2 <= 16, name
        ref = grid_sample(img, affine_grid(theta, h, w))
        got = pallas_affine_warp(img, theta, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4, err_msg=name)


def test_two_pass_warp_kernel_matches_xla(rng):
    """Mosaic-candidate two-pass warp kernel (interpret mode): same
    algebra as ops.affine_warp.two_pass_affine_warp — incl. the sheared
    first-pass kernel under rotation — to fp32 matmul-association
    noise."""
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp
    from cadepth_tpu.ops.pallas.two_pass_warp import pallas_two_pass_warp

    cases = {
        "identity": np.array([[1, 0, 0], [0, 1, 0.0]]),
        "zoom_shift": np.array([[0.8, 0, 0.1], [0, 1.2, -0.2]]),
        "rotation": np.array([[0.999, -0.03, 0.02], [0.03, 0.999, 0.01]]),
        "shear": np.array([[1.0, 0.1, 0.0], [0.05, 1.0, 0.0]]),
    }
    for (h, w, c, b) in [(24, 32, 8, 2), (15, 20, 16, 3)]:
        img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for name, th in cases.items():
            theta = jnp.asarray(
                (np.tile(th[None], (b, 1, 1))
                 + rng.normal(scale=0.01, size=(b, 2, 3))).astype(np.float32))
            for pad in ("zeros", "border"):
                want = two_pass_affine_warp(img, theta, pad, False,
                                            "highest")
                got = pallas_two_pass_warp(img, theta, pad, interpret=True)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), atol=1e-4,
                    err_msg=f"{name}/{pad}/{h}x{w}")


def test_two_pass_warp_kernel_rotfree_exact_vs_gather(rng):
    """On the rotation-free subspace the kernel must match the
    torch-parity gather path (the same exactness contract the XLA
    two-pass carries)."""
    from cadepth_tpu.ops import grid_sample
    from cadepth_tpu.ops.grid_sample import affine_grid
    from cadepth_tpu.ops.pallas.two_pass_warp import pallas_two_pass_warp

    b, h, w, c = 2, 16, 24, 8
    img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    theta = jnp.asarray(np.tile(
        np.array([[0.85, 0, 0.12], [0, 1.1, -0.07]], np.float32)[None],
        (b, 1, 1)))
    ref = grid_sample(img, affine_grid(theta, h, w))
    got = pallas_two_pass_warp(img, theta, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_two_pass_warp_kernel_bf16(rng):
    """bf16 path: tents cast to bf16 like the XLA version's _mat_dtype
    discipline; agreement within bf16 resolution."""
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp
    from cadepth_tpu.ops.pallas.two_pass_warp import pallas_two_pass_warp

    b, h, w, c = 2, 16, 24, 8
    img = jnp.asarray(rng.normal(size=(b, h, w, c))).astype(jnp.bfloat16)
    theta = jnp.asarray(np.tile(
        np.array([[0.9, -0.02, 0.1], [0.02, 1.05, 0.0]], np.float32)[None],
        (b, 1, 1)))
    want = two_pass_affine_warp(img, theta)
    got = pallas_two_pass_warp(img, theta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05)


def test_two_pass_warp_kernel_grads_match_xla(rng):
    """Trainable Pallas warp (interpret mode): d_img and d_theta match
    the XLA two-pass custom VJP to fp32 reduction noise."""
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp
    from cadepth_tpu.ops.pallas.two_pass_warp import (
        pallas_two_pass_warp_trainable,
    )

    b, h, w, c = 2, 16, 24, 8
    img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    for name, th0 in {
        "near_identity": np.array([[1.0, -0.02, 0.05], [0.02, 0.97, -0.03]]),
        "zoom": np.array([[0.8, 0.0, 0.1], [0.0, 1.2, -0.2]]),
    }.items():
        theta = jnp.asarray(
            (np.tile(th0[None], (b, 1, 1))
             + rng.normal(scale=0.01, size=(b, 2, 3))).astype(np.float32))
        for pad in ("zeros", "border"):
            def loss_ref(im, t):
                return jnp.sum(jnp.sin(
                    two_pass_affine_warp(im, t, pad, False, "highest")))

            def loss_pal(im, t):
                return jnp.sum(jnp.sin(
                    pallas_two_pass_warp_trainable(im, t, pad, False,
                                                   True)))

            gr_i, gr_t = jax.grad(loss_ref, argnums=(0, 1))(img, theta)
            gp_i, gp_t = jax.grad(loss_pal, argnums=(0, 1))(img, theta)
            np.testing.assert_allclose(np.asarray(gp_i), np.asarray(gr_i),
                                       atol=1e-4,
                                       err_msg=f"d_img {name}/{pad}")
            scale = float(jnp.max(jnp.abs(gr_t))) + 1e-6
            np.testing.assert_allclose(
                np.asarray(gp_t) / scale, np.asarray(gr_t) / scale,
                atol=2e-5, err_msg=f"d_theta {name}/{pad}")


def test_two_pass_warp_kernel_grads_at_kinks(rng):
    """d_theta at EXACT identity / axis-aligned thetas — the kink
    regime, which is the PCL's identity-initialized operating point:
    every sampling position lands precisely on grid integers, where the
    tent subgradient convention decides the gradient. Regression for
    the round-4 bug where `_dtent` used `-sign * [|diff| < 1]` instead
    of jax's abs'(0)=+1 / max-tie-0.5 conventions and diverged from the
    XLA custom VJP by up to 100% at these thetas (while matching
    off-kink thetas to 1e-6 — the older test jitters theta and so never
    saw it). Oracle: plain autodiff through the same forward with the
    custom VJP bypassed (`_warp_fwd`), verified identical to the XLA
    custom VJP."""
    from cadepth_tpu.ops import affine_warp as aw
    from cadepth_tpu.ops.pallas.two_pass_warp import (
        pallas_two_pass_warp_trainable,
    )

    b, h, w, c = 1, 16, 24, 8
    img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    for name, th0 in {
        "identity": np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        "scale_x": np.array([[0.98, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        "scale_y": np.array([[1.0, 0.0, 0.0], [0.0, 1.02, 0.0]]),
        "shear_d": np.array([[1.0, 0.0, 0.0], [0.01, 1.0, 0.0]]),
    }.items():
        theta = jnp.asarray(np.tile(th0[None], (b, 1, 1)).astype(np.float32))
        for pad in ("zeros", "border"):
            def loss_truth(im, t):
                return jnp.sum(aw._warp_fwd(im, t, pad, False, None)[0])

            def loss_pal(im, t):
                return jnp.sum(
                    pallas_two_pass_warp_trainable(im, t, pad, False, True))

            gt_t = jax.grad(loss_truth, argnums=1)(img, theta)
            gx_t = jax.grad(
                lambda im, t: jnp.sum(
                    aw.two_pass_affine_warp(im, t, pad, False, None)),
                argnums=1)(img, theta)
            gp_t = jax.grad(loss_pal, argnums=1)(img, theta)
            scale = float(jnp.max(jnp.abs(gt_t))) + 1e-6
            # the XLA custom VJP IS the autodiff gradient
            np.testing.assert_allclose(
                np.asarray(gx_t) / scale, np.asarray(gt_t) / scale,
                atol=1e-5, err_msg=f"xla-vs-truth {name}/{pad}")
            np.testing.assert_allclose(
                np.asarray(gp_t) / scale, np.asarray(gt_t) / scale,
                atol=2e-5, err_msg=f"pallas-vs-truth {name}/{pad}")


# ---------------------------------------------------------------------------
# Fused NHWC banded warp (ops/pallas/fused_warp.py)
# ---------------------------------------------------------------------------

def test_fused_warp_matches_two_pass(rng):
    """NHWC banded warp (interpret mode): matches two_pass_affine_warp
    — the production PCL warp, pcl_layer.h:97-110 semantics — to fp32
    noise inside the fused_warp_theta_ok regime. H=48 exercises REAL
    banding (kb_fwd=16 < H, kb_bwd=24 < H), unlike tiny sizes where the
    clamped band degenerates to dense."""
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp
    from cadepth_tpu.ops.pallas.fused_warp import (
        fused_warp_theta_ok,
        pallas_fused_warp,
    )

    cases = {
        "identity": np.array([[1, 0, 0], [0, 1, 0.0]]),
        "zoom_shift": np.array([[0.8, 0, 0.1], [0, 1.2, -0.2]]),
        "rotation": np.array([[0.999, -0.03, 0.02], [0.03, 0.999, 0.01]]),
        "shear": np.array([[1.0, 0.1, 0.0], [0.05, 1.0, 0.0]]),
        "oob_translate": np.array([[1, 0, 0.9], [0, 1, 0.9]]),
    }
    for (h, w, c, b) in [(48, 64, 8, 2), (15, 20, 16, 3)]:
        img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for name, th in cases.items():
            theta = jnp.asarray(
                (np.tile(th[None], (b, 1, 1))
                 + rng.normal(scale=0.01, size=(b, 2, 3))).astype(np.float32))
            assert bool(np.asarray(fused_warp_theta_ok(theta, h, w)).all()), \
                f"{name}/{h}x{w} unexpectedly outside the band regime"
            want = two_pass_affine_warp(img, theta, "zeros", False, "highest")
            got = pallas_fused_warp(img, theta, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-4,
                err_msg=f"{name}/{h}x{w}")


def test_fused_warp_border_raises(rng):
    """border padding makes the banded adjoint unbounded at edges; the
    fused warp refuses it (callers fall back to two_pass)."""
    from cadepth_tpu.ops.pallas.fused_warp import pallas_fused_warp

    img = jnp.zeros((1, 16, 24, 8), jnp.float32)
    theta = jnp.asarray(np.eye(2, 3, dtype=np.float32)[None])
    with pytest.raises(ValueError, match="zeros"):
        pallas_fused_warp(img, theta, padding_mode="border", interpret=True)


def test_fused_warp_theta_ok_rejects_out_of_band(rng):
    """Thetas whose vertical footprint exceeds the static band must be
    flagged invalid (they would silently truncate taps)."""
    from cadepth_tpu.ops.pallas.fused_warp import fused_warp_theta_ok

    h, w = 48, 64
    # it=4 / kb_f=12 band (the shipped tuning): pure-zoom coverage is
    # q <= (kb_f-3)/(it-1) = 3.0 — q=2.5 is IN band (parity-exact,
    # verified vs two_pass), q=3.5 is out.
    mid_zoom = jnp.asarray(
        np.array([[[1.0, 0, 0], [0, 2.5, 0.0]]], np.float32))  # |q|~2.5
    big_zoom = jnp.asarray(
        np.array([[[1.0, 0, 0], [0, 3.5, 0.0]]], np.float32))  # |q|~3.5
    tiny_zoom = jnp.asarray(
        np.array([[[1.0, 0, 0], [0, 0.2, 0.0]]], np.float32))  # |q|~0.2
    big_rot = jnp.asarray(
        np.array([[[0.96, -0.28, 0], [0.28, 0.96, 0.0]]], np.float32))
    near_id = jnp.asarray(
        np.array([[[1.02, -0.02, 0.1], [0.02, 0.97, -0.1]]], np.float32))
    assert bool(np.asarray(fused_warp_theta_ok(mid_zoom, h, w)).all())
    assert not bool(np.asarray(fused_warp_theta_ok(big_zoom, h, w)).any())
    assert not bool(np.asarray(fused_warp_theta_ok(tiny_zoom, h, w)).any())
    assert not bool(np.asarray(fused_warp_theta_ok(big_rot, h, w)).any())
    assert bool(np.asarray(fused_warp_theta_ok(near_id, h, w)).all())


def test_fused_warp_bf16(rng):
    """bf16 path: tent weights quantized to bf16 like the XLA version's
    _mat_dtype discipline; agreement within bf16 resolution."""
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp
    from cadepth_tpu.ops.pallas.fused_warp import pallas_fused_warp

    b, h, w, c = 2, 48, 64, 8
    img = jnp.asarray(rng.normal(size=(b, h, w, c))).astype(jnp.bfloat16)
    theta = jnp.asarray(np.tile(
        np.array([[0.9, -0.02, 0.1], [0.02, 1.05, 0.0]], np.float32)[None],
        (b, 1, 1)))
    want = two_pass_affine_warp(img, theta)
    got = pallas_fused_warp(img, theta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05)


def test_fused_warp_grads_match_xla(rng):
    """Trainable fused warp (interpret mode): d_img and d_theta match
    the XLA two-pass custom VJP to fp32 reduction noise — with the
    banded backward genuinely banded (H=48 > kb_bwd=24)."""
    from cadepth_tpu.ops.affine_warp import two_pass_affine_warp
    from cadepth_tpu.ops.pallas.fused_warp import (
        pallas_fused_warp_trainable,
    )

    b, h, w, c = 2, 48, 64, 8
    img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    for name, th0 in {
        "near_identity": np.array([[1.0, -0.02, 0.05], [0.02, 0.97, -0.03]]),
        "zoom": np.array([[0.8, 0.0, 0.1], [0.0, 1.2, -0.2]]),
        "rotation": np.array([[0.999, -0.03, 0.02], [0.03, 0.999, 0.01]]),
    }.items():
        theta = jnp.asarray(
            (np.tile(th0[None], (b, 1, 1))
             + rng.normal(scale=0.01, size=(b, 2, 3))).astype(np.float32))

        def loss_ref(im, t):
            return jnp.sum(jnp.sin(
                two_pass_affine_warp(im, t, "zeros", False, "highest")))

        def loss_pal(im, t):
            return jnp.sum(jnp.sin(
                pallas_fused_warp_trainable(im, t, "zeros", False, True)))

        gr_i, gr_t = jax.grad(loss_ref, argnums=(0, 1))(img, theta)
        gp_i, gp_t = jax.grad(loss_pal, argnums=(0, 1))(img, theta)
        np.testing.assert_allclose(np.asarray(gp_i), np.asarray(gr_i),
                                   atol=1e-4, err_msg=f"d_img {name}")
        scale = float(jnp.max(jnp.abs(gr_t))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(gp_t) / scale, np.asarray(gr_t) / scale,
            atol=2e-5, err_msg=f"d_theta {name}")


def test_fused_warp_grads_at_kinks(rng):
    """d_theta at EXACT identity / axis-aligned thetas (the PCL's
    identity-initialized operating point) — same kink-convention
    regression as the two_pass kernel's test; the fused backward reuses
    _dtent so it must inherit the fix."""
    from cadepth_tpu.ops import affine_warp as aw
    from cadepth_tpu.ops.pallas.fused_warp import (
        pallas_fused_warp_trainable,
    )

    b, h, w, c = 1, 48, 64, 8
    img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    for name, th0 in {
        "identity": np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        "scale_y": np.array([[1.0, 0.0, 0.0], [0.0, 1.02, 0.0]]),
        "shear_d": np.array([[1.0, 0.0, 0.0], [0.01, 1.0, 0.0]]),
    }.items():
        theta = jnp.asarray(np.tile(th0[None], (b, 1, 1)).astype(np.float32))

        def loss_truth(im, t):
            return jnp.sum(aw._warp_fwd(im, t, "zeros", False, None)[0])

        def loss_pal(im, t):
            return jnp.sum(
                pallas_fused_warp_trainable(im, t, "zeros", False, True))

        gt_t = jax.grad(loss_truth, argnums=1)(img, theta)
        gp_t = jax.grad(loss_pal, argnums=1)(img, theta)
        scale = float(jnp.max(jnp.abs(gt_t))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(gp_t) / scale, np.asarray(gt_t) / scale,
            atol=2e-5, err_msg=f"pallas-vs-truth {name}")

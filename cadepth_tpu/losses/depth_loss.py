"""Depth loss zoo — pure jittable functions, fp32 reductions, NHWC.

Numerics match the reference (`src/loss/depth_loss.h`) term by term, but
the reference's dynamic-shape `masked_select` reductions become
fixed-shape ``where``-sums (TPU-friendly), and the combined loss returns
its per-term components from a single evaluation instead of recomputing
every term for logging (`depth_loss.h:438-467` recomputes).

Shapes: pred/gt depth (B, H, W, 1); image (B, H, W, 3);
intrinsics (B, 3, 3) or (3, 3); masks are boolean, same shape as depth.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from cadepth_tpu.ops.resize import avg_pool2d

_CLAMP_MAX = 1000.0


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of `values` over `mask`; 0 if the mask is empty."""
    mask = mask.astype(values.dtype)
    n = jnp.sum(mask)
    total = jnp.sum(values * mask)
    return jnp.where(n > 0, total / jnp.maximum(n, 1.0), 0.0)


def scale_invariant_loss(
    pred: jax.Array,
    gt: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    lam: float = 0.5,
    eps: float = 1e-6,
) -> jax.Array:
    """Eigen'14 SILog loss: mean(d^2) - lam * (sum d)^2 / n^2, d = log p - log g.

    Parity with `ScaleInvariantLoss::forward` (`depth_loss.h:33-64`):
    default mask gt > eps, depths clamped to [eps, 1000], returns 0 on
    empty masks.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = (gt > eps) if valid_mask is None else valid_mask
    maskf = mask.astype(jnp.float32)

    d = jnp.log(jnp.clip(pred, eps, _CLAMP_MAX)) - jnp.log(jnp.clip(gt, eps, _CLAMP_MAX))
    d = d * maskf
    n = jnp.sum(maskf)
    n_safe = jnp.maximum(n, 1.0)
    term1 = jnp.sum(d * d) / n_safe
    term2 = lam * jnp.square(jnp.sum(d)) / (n_safe * n_safe)
    return jnp.where(n > 0, term1 - term2, 0.0)


def _gradient_loss_single_scale(pred_log: jax.Array, gt_log: jax.Array) -> jax.Array:
    """L1 between forward-difference gradients, averaged over all pixels.

    NOTE: the reference's `computeGradientLoss` (`depth_loss.h:135-166`)
    accepts a mask but never applies it — preserved here (no mask arg).
    """
    pgx = pred_log[..., :, 1:, :] - pred_log[..., :, :-1, :]
    ggx = gt_log[..., :, 1:, :] - gt_log[..., :, :-1, :]
    pgy = pred_log[..., 1:, :, :] - pred_log[..., :-1, :, :]
    ggy = gt_log[..., 1:, :, :] - gt_log[..., :-1, :, :]
    return jnp.mean(jnp.abs(pgx - ggx)) + jnp.mean(jnp.abs(pgy - ggy))


def gradient_matching_loss(
    pred: jax.Array,
    gt: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    num_scales: int = 4,
    eps: float = 1e-6,
) -> jax.Array:
    """MiDaS multi-scale gradient matching loss in log-depth space.

    Parity with `GradientMatchingLoss::forward` (`depth_loss.h:95-124`):
    scale s downsampled by avg_pool(2^s), log-clamped to [eps, 1000],
    averaged over scales. `valid_mask` is accepted but unused, matching
    the reference behavior (see `_gradient_loss_single_scale`).
    """
    del valid_mask  # reference parity: mask is declared but never applied
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    total = 0.0
    for scale in range(num_scales):
        if scale == 0:
            p, g = pred, gt
        else:
            factor = 2 ** scale
            p = avg_pool2d(pred, factor)
            g = avg_pool2d(gt, factor)
        p = jnp.log(jnp.clip(p, eps, _CLAMP_MAX))
        g = jnp.log(jnp.clip(g, eps, _CLAMP_MAX))
        total = total + _gradient_loss_single_scale(p, g)
    return total / num_scales


def smoothness_loss(pred: jax.Array, image: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Monodepth edge-aware smoothness: sum |∂d̂| * exp(-|∂I|).

    Parity with `SmoothnessLoss::forward` (`depth_loss.h:189-234`):
    depth is mean-normalized per sample (mean over H, W, keepdims);
    image gradients averaged over RGB.
    """
    pred = pred.astype(jnp.float32)
    image = image.astype(jnp.float32)
    depth_mean = jnp.mean(pred, axis=(-3, -2), keepdims=True)
    dn = pred / (depth_mean + eps)

    dgx = jnp.abs(dn[..., :, 1:, :] - dn[..., :, :-1, :])
    dgy = jnp.abs(dn[..., 1:, :, :] - dn[..., :-1, :, :])

    igx = jnp.mean(jnp.abs(image[..., :, 1:, :] - image[..., :, :-1, :]), axis=-1, keepdims=True)
    igy = jnp.mean(jnp.abs(image[..., 1:, :, :] - image[..., :-1, :, :]), axis=-1, keepdims=True)

    loss_x = jnp.mean(dgx * jnp.exp(-igx))
    loss_y = jnp.mean(dgy * jnp.exp(-igy))
    return loss_x + loss_y


def reprojection_loss(
    pred: jax.Array,
    gt: jax.Array,
    intrinsics: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """3D point-cloud consistency loss (UniDepth-inspired).

    Back-projects pred and gt depth through K and penalizes the mean L2
    distance between the point clouds on valid pixels. Parity with
    `ReprojectionLoss::forward` (`depth_loss.h:268-331`): per-batch
    fx/fy/cx/cy (broadcast if unbatched), sqrt(diff^2 + eps) inside the
    norm, default mask gt > eps, 0 on empty mask.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    b, h, w, _ = pred.shape
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics, (b, 3, 3))
    intrinsics = intrinsics.astype(jnp.float32)

    fx = intrinsics[:, 0, 0][:, None, None, None]
    fy = intrinsics[:, 1, 1][:, None, None, None]
    cx = intrinsics[:, 0, 2][:, None, None, None]
    cy = intrinsics[:, 1, 2][:, None, None, None]

    grid_x = jax.lax.broadcasted_iota(jnp.float32, (1, h, w, 1), 2)
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (1, h, w, 1), 1)

    # Back-project both depths; Z terms are the depths themselves.
    xs = (grid_x - cx) / (fx + eps)
    ys = (grid_y - cy) / (fy + eps)
    diff_x = xs * (pred - gt)
    diff_y = ys * (pred - gt)
    diff_z = pred - gt
    point_error = jnp.sqrt(diff_x * diff_x + diff_y * diff_y + diff_z * diff_z + eps)

    mask = (gt > eps) if valid_mask is None else valid_mask
    return _masked_mean(point_error, mask)


def reprojection_loss_photometric(
    pred: jax.Array,
    gt: jax.Array,
    intrinsics: jax.Array,
    source_image: jax.Array,
    target_image: jax.Array,
) -> jax.Array:
    """Photometric reprojection stub (returns 0).

    The reference declares `forwardPhotometric` but leaves it a stub
    returning zeros (`depth_loss.h:343-351`); preserved for API parity.
    """
    del gt, intrinsics, source_image, target_image
    return jnp.zeros((), dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class CombinedDepthLoss:
    """Weighted sum of the four depth loss terms with component logging.

    Parity with `CombinedDepthLoss` (`depth_loss.h:366-479`) — default
    weights 1.0 / 0.1 / 0.001 / 0.01 — but components come back from the
    same evaluation (the reference recomputes each term for logging).
    """

    si_weight: float = 1.0
    grad_weight: float = 0.1
    smooth_weight: float = 0.001
    reproj_weight: float = 0.01
    si_lambda: float = 0.5
    grad_num_scales: int = 4
    eps: float = 1e-6

    def __call__(
        self,
        pred: jax.Array,
        gt: jax.Array,
        image: jax.Array,
        intrinsics: Optional[jax.Array] = None,
        valid_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """Returns (total_loss, components).

        With `intrinsics`, matches `forwardWithIntrinsics`
        (`depth_loss.h:416-433`); without, matches `forward`
        (`depth_loss.h:390-404`, no reprojection term).
        """
        si = scale_invariant_loss(pred, gt, valid_mask, self.si_lambda, self.eps)
        grad = gradient_matching_loss(pred, gt, valid_mask, self.grad_num_scales, self.eps)
        smooth = smoothness_loss(pred, image, self.eps)
        components = {"si_loss": si, "grad_loss": grad, "smooth_loss": smooth}
        total = (
            self.si_weight * si
            + self.grad_weight * grad
            + self.smooth_weight * smooth
        )
        if intrinsics is not None:
            reproj = reprojection_loss(pred, gt, intrinsics, valid_mask, self.eps)
            components["reproj_loss"] = reproj
            total = total + self.reproj_weight * reproj
        components["total_loss"] = total
        return total, components

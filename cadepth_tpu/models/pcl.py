"""Perspective Correction Layers (`src/layers/pcl_layer.h`).

STN-style camera-conditioned feature warping. The 6-parameter head is
identity-initialized (zero kernel, bias [1, 1, 0, 0, 0, 0] —
`pcl_layer.h:64-66`) so the layer starts as a no-op; warping uses the
torch-parity `affine_grid`/`grid_sample` from
:mod:`cadepth_tpu.ops.grid_sample` (align_corners=False + zeros padding,
matching `pcl_layer.h:101-108`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cadepth_tpu.ops.affine_warp import (
    separable_affine_warp,
    two_pass_affine_warp,
)
from cadepth_tpu.ops.grid_sample import affine_grid, grid_sample


# Rotation magnitude (rad) under which the two-pass GEMM warp's kernel
# displacement (<= |tan rot| px) stays sub-pixel; "auto" mode's runtime
# guard and the trainer's pcl_max_rot monitoring both key on it.
DEFAULT_ROT_BOUND = 0.05


def _build_affine_matrix(params: jax.Array) -> jax.Array:
    """(B, 6) -> (B, 2, 3) affine θ.

    Layout per `PerspectiveCorrectionLayerImpl::buildAffineMatrix`
    (`pcl_layer.h:152-179`):
      [[sx*cos(r), -sin(r)+shear, tx],
       [sin(r),     sy*cos(r),    ty]]
    """
    sx, sy = params[:, 0], params[:, 1]
    tx, ty = params[:, 2], params[:, 3]
    rot, shear = params[:, 4], params[:, 5]
    cos_r = jnp.cos(rot)
    sin_r = jnp.sin(rot)
    row0 = jnp.stack([sx * cos_r, -sin_r + shear, tx], axis=-1)
    row1 = jnp.stack([sin_r, sy * cos_r, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


class PerspectiveCorrectionLayer(nn.Module):
    """Learned affine re-sampling conditioned on K (`pcl_layer.h:29-181`)."""

    feature_channels: int
    camera_dim: int = 4
    hidden_dim: int = 128
    # Apply the forward3D ray-z gating (pcl_layer.h:118-140). The reference
    # decoder invokes the 3-arg forward which accepts-but-IGNORES rays
    # (pcl_layer.h:76-111; geometry_aware_network.h:144-145), so parity
    # default is False. forward3D behavior = gate_with_rays=True.
    gate_with_rays: bool = False
    # Warp backend. "two_pass" (default) is the gather-free two-pass
    # GEMM warp (ops/affine_warp.py): exact vs the reference's bilinear
    # grid_sample for zero predicted rotation (scale/shear/translate all
    # free), and under true rotation the first-pass kernel is displaced
    # by at most |tan rot| px — sub-pixel for any plausible learned
    # rotation (PCL's 6-param head is identity-initialized and its
    # rotations stay ~1e-2 rad in practice; the layer sows its per-batch
    # max |rot| as the "pcl_max_rot" intermediate so monitoring can
    # verify the bound, see make_eval_step). "auto" adds a per-level
    # runtime guard: predicted |rotation| < rot_bound uses two_pass,
    # beyond it falls back to the exact gather path via lax.cond — the
    # cond boundaries cost ~15% of the geometry step (PERF_NOTES.md), so
    # it's opt-in for workloads that expect large learned rotations.
    # "gather" = reference-parity grid_sample always; "separable" =
    # shared-matrix GEMM warp always (exact for the axis-aligned
    # scale+translate subspace, silently drops predicted rotation AND
    # shear — fastest). XLA TPU gathers are near scalar speed, hence a
    # GEMM-warp default. "pallas" = EXPERIMENTAL Mosaic kernel with
    # in-kernel tent generation (ops/pallas/two_pass_warp.py): same
    # semantics and gradients as "two_pass" with zero HBM tent traffic
    # and zero layout-relayout copies — gated on the remote Mosaic
    # compiler actually compiling (interpret-parity tested; see
    # PERF_NOTES "layout-copy tax"). "fused" = NHWC-native BANDED Pallas
    # kernels (ops/pallas/fused_warp.py): zero transposes, banded VPU V
    # pass — exact vs two_pass inside `fused_warp_theta_ok` (generous
    # around the identity-initialized regime; monitored the same way
    # via pcl_max_rot), zeros padding only.
    warp_mode: str = "two_pass"
    rot_bound: float = DEFAULT_ROT_BOUND
    dtype: Any = jnp.bfloat16

    def _transform(self, features, camera_intrinsics, train: bool):
        b = features.shape[0]
        pooled = jnp.mean(features, axis=(1, 2)).astype(jnp.float32)  # (B, C)
        loc_in = jnp.concatenate(
            [pooled, camera_intrinsics.astype(jnp.float32)], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=jnp.float32,
                             name="loc_fc1")(loc_in))
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=jnp.float32,
                             name="loc_fc2")(h))
        params = nn.Dense(
            6,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                [1.0, 1.0, 0.0, 0.0, 0.0, 0.0], dtype),
            dtype=jnp.float32,
            name="fc_transform",
        )(h)
        theta = _build_affine_matrix(params)
        # Monitoring hook: per-batch max predicted |rotation|, so runs
        # using the GEMM warps can verify the ≤|tan rot|-px displacement
        # bound stays sub-pixel (read via mutable=["intermediates"];
        # the eval step surfaces the max across levels as pcl_max_rot).
        self.sow("intermediates", "pcl_max_rot",
                 jnp.max(jnp.abs(params[:, 4])))

        def warp_gather(feats, th):
            grid = affine_grid(th, feats.shape[1], feats.shape[2],
                               align_corners=False)
            return grid_sample(feats, grid, padding_mode="zeros",
                               align_corners=False)

        def warp_two_pass(feats, th):
            return two_pass_affine_warp(feats, th, padding_mode="zeros",
                                        align_corners=False)

        def warp_separable(feats, th):
            return separable_affine_warp(feats, th, padding_mode="zeros",
                                         align_corners=False)

        if self.warp_mode == "gather":
            return warp_gather(features, theta)
        if self.warp_mode == "two_pass":
            return warp_two_pass(features, theta)
        if self.warp_mode == "separable":
            return warp_separable(features, theta)
        if self.warp_mode == "pallas":
            from cadepth_tpu.ops.pallas.two_pass_warp import (
                pallas_two_pass_warp_trainable,
            )

            # interpret mode on CPU (tests); real Mosaic lowering on TPU
            interp = jax.default_backend() == "cpu"
            return pallas_two_pass_warp_trainable(features, theta,
                                                  "zeros", False, interp)
        if self.warp_mode == "fused":
            from cadepth_tpu.ops.pallas.fused_warp import (
                pallas_fused_warp_trainable,
            )

            interp = jax.default_backend() == "cpu"
            return pallas_fused_warp_trainable(features, theta,
                                               "zeros", False, interp)
        if self.warp_mode != "auto":
            raise ValueError(f"Unknown warp_mode: {self.warp_mode}")
        # Lazy gather fallback: the two-pass warp runs UNCONDITIONALLY in
        # the main trace (so XLA keeps it fused with the surrounding
        # convs), and the cond merely selects between that result and the
        # exact-gather recompute. Bit-identical outputs to the dual-branch
        # cond (same predicate picking between the same two functions),
        # but in-bound steps — the overwhelmingly common case for an
        # identity-initialized rotation head — pay ~a select instead of
        # the ~15%-of-step fusion tax the dual-branch cond cost
        # (PERF_NOTES "warp-mode ladder"); out-of-bound steps waste one
        # two_pass (rare by construction).
        two_pass_out = warp_two_pass(features, theta)
        in_bound = jnp.max(jnp.abs(params[:, 4])) < self.rot_bound
        return jax.lax.cond(
            in_bound,
            lambda feats, th, out: out,
            lambda feats, th, out: warp_gather(feats, th),
            features, theta, two_pass_out)

    @nn.compact
    def __call__(self, features, camera_intrinsics,
                 ray_directions: Optional[jax.Array] = None,
                 train: bool = False):
        """features (B,H,W,C), K4 (B,4), optional rays (B,H,W,3).

        With `gate_with_rays=True` and rays given, applies the 3D-aware
        viewing-angle gating of `forward3D` (`pcl_layer.h:118-140`):
        features scaled by 0.5 + 0.5*|ray_z|. Otherwise rays are
        accepted-but-ignored, matching the reference's live decoder path.
        """
        corrected = self._transform(features, camera_intrinsics, train)
        if self.gate_with_rays and ray_directions is not None:
            weight = jnp.abs(ray_directions[..., 2:3]).astype(corrected.dtype)
            corrected = corrected * (0.5 + 0.5 * weight)
        return corrected


class Perspective3DTransformer(nn.Module):
    """Ray-displaced warping with per-pixel depth offsets (`pcl_layer.h:193-279`)."""

    feature_channels: int
    camera_dim: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features, camera_intrinsics, ray_directions,
                 train: bool = False):
        b, h, w, _ = features.shape
        depth_offset = jnp.tanh(
            nn.Conv(1, (1, 1), dtype=jnp.float32, name="depth_pred")(
                features.astype(jnp.float32)))  # (B, H, W, 1) in [-1, 1]

        pooled = jnp.mean(features, axis=(1, 2)).astype(jnp.float32)
        loc_in = jnp.concatenate(
            [pooled, camera_intrinsics.astype(jnp.float32)], axis=-1)
        hdn = nn.relu(nn.Dense(128, dtype=jnp.float32, name="loc_fc1")(loc_in))
        translation = nn.Dense(
            3, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=jnp.float32, name="loc_fc2")(hdn)  # (B, 3) = [tx, ty, tz]

        rays = ray_directions.astype(jnp.float32)
        dx = depth_offset * rays[..., 0:1] + translation[:, None, None, 0:1]
        dy = depth_offset * rays[..., 1:2] + translation[:, None, None, 1:2]

        # Normalized displacement grid; border padding + align_corners=True
        # per `pcl_layer.h:262-274`.
        grid = jnp.concatenate([dx / (w / 2.0), dy / (h / 2.0)], axis=-1)
        return grid_sample(features, grid, padding_mode="border",
                           align_corners=True)

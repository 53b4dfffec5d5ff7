"""Jitted train/eval steps with donated state (the device hot loop).

TPU-first design: one `train_step(state, batch) -> (state, logs)` pjit'd
over the mesh — forward (bf16 compute), 4-term loss, backward, global
grad-norm clip, optimizer update, and loss-component logging all in a
single compiled program, with the state buffers donated so parameters
update in place in HBM. Rays are derived on device from the batch
intrinsics (fusing the reference's entire `preprocess_rays` stage —
`ray_direction_computer.cpp:17-62` — into the step).

The eval step runs the full 12-metric suite on device, replacing the
reference's host-side per-sample metric loops (`evaluator.h:142-226`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import flax.struct
import flax.traverse_util
import jax
import jax.numpy as jnp
import optax

from cadepth_tpu.config import Config, OptimizationConfig
from cadepth_tpu.geometry.rays import ray_grid_batch
from cadepth_tpu.losses.depth_loss import CombinedDepthLoss
from cadepth_tpu.metrics.depth_metrics import compute_depth_metrics
from cadepth_tpu.models.factory import create_model, model_inputs


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def build_optimizer(opt: OptimizationConfig,
                    lr_schedule: optax.Schedule) -> optax.GradientTransformation:
    """adam/adamw/sgd + optional global-norm clipping (trainer.h:24-92)."""
    if opt.optimizer == "adam":
        tx = optax.adam(lr_schedule, b1=opt.adam_betas[0], b2=opt.adam_betas[1],
                        eps=opt.adam_eps)
    elif opt.optimizer == "adamw":
        tx = optax.adamw(lr_schedule, b1=opt.adam_betas[0], b2=opt.adam_betas[1],
                         eps=opt.adam_eps, weight_decay=opt.weight_decay)
    elif opt.optimizer == "sgd":
        tx = optax.sgd(lr_schedule, momentum=opt.sgd_momentum,
                       nesterov=opt.sgd_nesterov)
    else:
        raise ValueError(f"Unknown optimizer: {opt.optimizer}")
    if opt.gradient_clip:
        tx = optax.chain(optax.clip_by_global_norm(opt.gradient_clip_value), tx)
    if opt.grad_accum_steps > 1:
        # Accumulate k micro-batch gradients, then clip+update on their
        # mean — the LR schedule advances once per effective update.
        tx = optax.MultiSteps(tx, every_k_schedule=opt.grad_accum_steps)
    return tx


def build_model_and_loss(cfg: Config, dtype=jnp.bfloat16):
    model = create_model(
        cfg.model.architecture,
        in_channels=cfg.model.in_channels,
        init_features=cfg.model.init_features,
        camera_dim=cfg.model.camera_dim,
        max_depth=cfg.model.max_depth,
        use_pcl=cfg.model.use_pcl,
        use_attention=cfg.model.use_attention,
        variant=cfg.model.variant,
        remat=cfg.model.remat,
        pcl_warp=cfg.model.pcl_warp,
        norm=cfg.model.norm,
        decoder_upsample=cfg.model.decoder_upsample,
        sa_lowering=cfg.model.sa_lowering,
        dtype=dtype if cfg.training.use_amp else jnp.float32,
    )
    loss_fn = CombinedDepthLoss(
        si_weight=cfg.loss.si_weight,
        grad_weight=cfg.loss.grad_weight,
        smooth_weight=cfg.loss.smooth_weight,
        reproj_weight=cfg.loss.reproj_weight,
        si_lambda=cfg.loss.si_lambda,
        grad_num_scales=cfg.loss.grad_num_scales,
    )
    return model, loss_fn


def _batch_with_rays(batch: Dict[str, jax.Array], needs_rays: bool,
                     derive_rays: bool) -> Dict[str, jax.Array]:
    """Ensure geometry batches carry a ray grid.

    With ``derive_rays`` (= data.compute_rays) the grid is always derived
    on device from K. Without it, host batches are expected to carry the
    stored ``rays.bin`` grids — but some feeds never store rays at all
    (the device-resident HBM path, packs), so an absent key falls back to
    on-device derivation rather than a trace-time KeyError. (The
    reference's own fallback for missing rays is zeros,
    `sunrgbd_loader.cpp:151-156`; the host loader reproduces that quirk
    for missing files — this branch only covers feeds with no rays
    channel at all, where zeros would silently disable the geometry
    models' conditioning.)
    """
    if needs_rays and (derive_rays or "rays" not in batch):
        h, w = batch["rgb"].shape[1], batch["rgb"].shape[2]
        batch = dict(batch)
        batch["rays"] = ray_grid_batch(batch["intrinsics"], h, w)
    return batch


def create_train_state(cfg: Config, model, tx, rng: jax.Array,
                       sample_batch: Dict[str, jax.Array]) -> TrainState:
    """Initialize params/batch_stats/opt_state from an example batch."""
    arch = cfg.model.architecture
    needs_rays = arch.startswith("geometry_aware")
    batch = _batch_with_rays(sample_batch, needs_rays, cfg.data.compute_rays)
    args, kwargs = model_inputs(arch, batch, train=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, *args, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    cfg: Config,
    model,
    loss_fn: CombinedDepthLoss,
    tx: optax.GradientTransformation,
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted training step.

    Returns logs: total/si/grad/smooth/reproj losses + pre-clip global
    gradient norm (the reference computes grad norm in a second pass over
    parameters, `tensorboard_trainer_enhanced.h:560-571`; here it falls
    out of the same compiled program).
    """
    arch = cfg.model.architecture
    needs_rays = arch.startswith("geometry_aware")
    derive_rays = cfg.data.compute_rays
    valid_from_range = cfg.loss.min_depth

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        batch = _batch_with_rays(batch, needs_rays, derive_rays)
        args, kwargs = model_inputs(arch, batch, train=True)
        gt = batch["depth"]
        valid_mask = gt > valid_from_range

        def loss_of(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            pred, mutated = model.apply(variables, *args, **kwargs,
                                        mutable=["batch_stats"])
            total, comps = loss_fn(pred, gt, batch["rgb"],
                                   batch["intrinsics"], valid_mask)
            # norm=group models may carry no batch statistics at all
            return total, (comps,
                           mutated.get("batch_stats", state.batch_stats))

        (_, (comps, new_batch_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        grad_leaves = jax.tree_util.tree_leaves(grads)
        grad_max = jnp.max(jnp.stack([jnp.max(g) for g in grad_leaves]))
        grad_min = jnp.min(jnp.stack([jnp.min(g) for g in grad_leaves]))
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        logs = dict(comps)
        logs["grad_norm"] = grad_norm
        logs["grad_max"] = grad_max
        logs["grad_min"] = grad_min
        return new_state, logs

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_grad_fn(
    cfg: Config,
    model,
    loss_fn: CombinedDepthLoss,
) -> Callable[[TrainState, Dict[str, jax.Array]], Any]:
    """Jitted gradient-only pass for observability.

    Returns the raw gradient pytree for per-parameter histogram logging
    (`tensorboard_trainer_enhanced.h:523-555` logs `gradients/<name>`
    histograms every histogram_interval). The hot train step never
    returns the grad pytree to the host — this separate program runs
    only at the histogram interval, so the extra fwd+bwd and the
    grads-to-host transfer cost nothing in steady state.
    """
    arch = cfg.model.architecture
    needs_rays = arch.startswith("geometry_aware")
    derive_rays = cfg.data.compute_rays
    valid_from_range = cfg.loss.min_depth

    def grad_fn(state: TrainState, batch: Dict[str, jax.Array]):
        batch = _batch_with_rays(batch, needs_rays, derive_rays)
        args, kwargs = model_inputs(arch, batch, train=True)
        gt = batch["depth"]
        valid_mask = gt > valid_from_range

        def loss_of(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            pred, _ = model.apply(variables, *args, **kwargs,
                                  mutable=["batch_stats"])
            total, _ = loss_fn(pred, gt, batch["rgb"],
                               batch["intrinsics"], valid_mask)
            return total

        return jax.grad(loss_of)(state.params)

    return jax.jit(grad_fn)


def make_eval_step(
    cfg: Config,
    model,
    loss_fn: CombinedDepthLoss,
) -> Callable[[TrainState, Dict[str, jax.Array]], Dict[str, jax.Array]]:
    """Jitted validation step: loss components + full metric suite on device."""
    arch = cfg.model.architecture
    needs_rays = arch.startswith("geometry_aware")
    derive_rays = cfg.data.compute_rays

    def eval_fn(state: TrainState, batch: Dict[str, jax.Array]):
        batch = _batch_with_rays(batch, needs_rays, derive_rays)
        args, kwargs = model_inputs(arch, batch, train=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred, inter = model.apply(variables, *args, **kwargs,
                                  mutable=["intermediates"])
        gt = batch["depth"]
        valid_mask = gt > cfg.loss.min_depth
        total, comps = loss_fn(pred, gt, batch["rgb"],
                               batch["intrinsics"], valid_mask)
        metrics = compute_depth_metrics(
            pred, gt, min_depth=cfg.validation.min_depth,
            max_depth=cfg.validation.max_depth)
        out = dict(comps)
        out.update(metrics)
        # Max predicted PCL |rotation| across decoder levels: the GEMM
        # warp's kernel-displacement bound is |tan rot| px, so this
        # scalar is the live proof the two_pass default stays sub-pixel
        # (models/pcl.py warp_mode docs).
        rots = [jnp.max(jnp.stack(v)) for k, v in
                flax.traverse_util.flatten_dict(
                    inter.get("intermediates", {})).items()
                if k[-1] == "pcl_max_rot"]
        if rots:
            out["pcl_max_rot"] = jnp.max(jnp.stack(rots))
        return out

    return jax.jit(eval_fn)


def make_predict_fn(cfg: Config, model):
    """Jitted inference-only forward (for evaluation/visualization)."""
    arch = cfg.model.architecture
    needs_rays = arch.startswith("geometry_aware")
    derive_rays = cfg.data.compute_rays

    @functools.partial(jax.jit)
    def predict(state: TrainState, batch: Dict[str, jax.Array]):
        b = _batch_with_rays(batch, needs_rays, derive_rays)
        args, kwargs = model_inputs(arch, b, train=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, *args, **kwargs)

    return predict

"""Learning-rate schedules (optax), per-optimizer-step granularity.

The reference implements linear warmup + step decay inside its trainer
(`trainer.h:24-92` config: lr_scheduler step/cosine/plateau/none,
lr_step_size, lr_gamma, lr_warmup_epochs, lr_min). Epoch-based rules are
converted to step counts via `steps_per_epoch`.
"""

from __future__ import annotations

import optax

from cadepth_tpu.config import OptimizationConfig


def build_lr_schedule(opt: OptimizationConfig, steps_per_epoch: int,
                      num_epochs: int) -> optax.Schedule:
    """Warmup + {step | cosine | none} decay schedule."""
    steps_per_epoch = max(steps_per_epoch, 1)
    warmup_steps = opt.lr_warmup_epochs * steps_per_epoch
    base_lr = opt.learning_rate

    # join_schedules feeds the decay schedule (step - warmup_steps), so
    # epoch boundaries are expressed relative to the end of warmup to keep
    # the reference's "decay every lr_step_size epochs from training start"
    # semantics (trainer.h:33-38).
    if opt.lr_scheduler in ("none", "constant", "plateau"):
        # plateau (validation-driven) is approximated as constant; the
        # trainer can early-stop instead (reference never wired plateau).
        decay = optax.constant_schedule(base_lr)
    elif opt.lr_scheduler == "step":
        boundaries = {
            e * steps_per_epoch - warmup_steps: opt.lr_gamma
            for e in range(opt.lr_step_size, num_epochs + 1, opt.lr_step_size)
            if e * steps_per_epoch > warmup_steps
        }
        decay = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif opt.lr_scheduler == "cosine":
        total = max(num_epochs * steps_per_epoch - warmup_steps, 1)
        decay = optax.cosine_decay_schedule(
            base_lr, decay_steps=total, alpha=opt.lr_min / base_lr)
    else:
        raise ValueError(f"Unknown lr_scheduler: {opt.lr_scheduler}")

    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.join_schedules([warmup, decay], [warmup_steps])
    return decay

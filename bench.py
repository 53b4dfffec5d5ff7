#!/usr/bin/env python
"""Headline benchmark: BaselineUNet training throughput, one TPU chip.

Mirrors the reference's published setting (README.md:762-765: baseline
U-Net, init_features 64, batch 16, 240x320 — claimed 25-30 samples/s on
M4 Pro, 80-100 on A100; the one real measured run was ~0.7 img/s).
`vs_baseline` is measured against the reference's best *claimed* M4 Pro
number (27.5 img/s mid-range); the BASELINE.json north star (>=4x
LibTorch-CPU on one v5e chip) corresponds to vs_baseline >= 4.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 27.5  # README.md:762-765, M4 Pro claim (batch 16, 240x320)

BATCH = 16
HEIGHT, WIDTH = 240, 320
WARMUP_STEPS = 5
MEASURE_STEPS = 50


def main() -> None:
    import jax

    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        build_optimizer,
        create_train_state,
        make_train_step,
    )
    from __graft_entry__ import _example_batch

    cfg = config_from_dict({
        "model": {"architecture": "baseline_unet", "init_features": 64},
        "optimization": {"optimizer": "adamw", "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "training": {"batch_size": BATCH, "use_amp": True},
        "data": {"compute_rays": True},
    })
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 100, 100))

    batch = {k: jax.device_put(v)
             for k, v in _example_batch(BATCH, HEIGHT, WIDTH).items()}
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(cfg, model, loss_fn, tx, donate=True)

    def hard_sync(s):
        # Force a device->host readback of an updated parameter: on this
        # tunneled runtime, block_until_ready can return before the whole
        # program retires, so a value transfer is the only reliable fence.
        leaf = jax.tree_util.tree_leaves(s.params)[0]
        np.asarray(leaf).ravel()[0]

    for _ in range(WARMUP_STEPS):
        state, logs = train_step(state, batch)
    hard_sync(state)

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, logs = train_step(state, batch)
    hard_sync(state)
    elapsed = time.perf_counter() - t0

    images_per_sec = MEASURE_STEPS * BATCH / elapsed
    print(json.dumps({
        "metric": "sunrgbd_baseline_unet_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

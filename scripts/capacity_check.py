#!/usr/bin/env python
"""Production-config HBM capacity check, on the real TPU (VERDICT r3
item 6).

AOT-compiles the production per-chip training step (geometry_aware
f96, 480x640, per-chip batch = global 32 / v5e-8 = 4, pcl_warp
two_pass, bf16 AMP) and reads XLA's own memory accounting, then adds
the quantized device-resident shard arithmetic (full SUN RGB-D at
480x640 = 10,335 x 1.536 MB = 15.88 GB -> /8 chips) and asserts the
sum fits a 16 GB v5e. CPU-backend memory_analysis is NOT a substitute:
its layouts/fusions differ (measured 17.6 GB temp at b4 on CPU vs the
chip training b8 no-remat inside 16 GB — round-3 bench).

Writes a JSON record (default /tmp/capacity_check.json) for
PARITY.md. Compile-only — nothing executes; ~1-5 min warm cache.

Usage: python scripts/capacity_check.py [out.json] [--batch N]
"""

from __future__ import annotations

import json
import os
import sys
import time

_sys_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _sys_dir)

HBM_BYTES = 16 * 2**30          # v5e
N_SUNRGBD = 10335
H, W = 480, 640
N_CHIPS = 8                     # v5e-8 production slice


def main() -> int:
    batch = 4                   # production global 32 / 8 chips
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    out_path = args[0] if args else "/tmp/capacity_check.json"

    import jax
    import jax.numpy as jnp

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        build_optimizer,
        create_train_state,
        make_train_step,
    )
    from cadepth_tpu.utils import enable_compilation_cache
    from __graft_entry__ import _example_batch

    enable_compilation_cache()
    record = {"date": time.strftime("%Y-%m-%d %H:%M"),
              "device": str(jax.devices()[0]),
              "config": f"geometry_aware f96 b{batch} {H}x{W} two_pass"}

    cfg = config_from_dict({
        "model": {"architecture": "geometry_aware", "init_features": 96,
                  "pcl_warp": "two_pass"},
        "optimization": {"optimizer": "adamw", "lr_scheduler": "cosine",
                         "lr_warmup_epochs": 0},
        "training": {"batch_size": batch, "use_amp": True},
        "data": {"compute_rays": True,
                 "input_height": H, "input_width": W},
    })
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 10, 10))
    batch_arrs = {k: jnp.asarray(v)
                  for k, v in _example_batch(batch, H, W).items()}
    state = jax.eval_shape(
        lambda: create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                                   batch_arrs))
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)
    t0 = time.time()
    compiled = step.lower(state, batch_arrs).compile()
    record["compile_s"] = round(time.time() - t0, 1)
    mem = compiled.memory_analysis()
    gb = 1.0 / 2**30
    step_bytes = (mem.argument_size_in_bytes + mem.output_size_in_bytes
                  + mem.temp_size_in_bytes)
    record["step"] = {
        "argument_gb": round(mem.argument_size_in_bytes * gb, 3),
        "output_gb": round(mem.output_size_in_bytes * gb, 3),
        "temp_gb": round(mem.temp_size_in_bytes * gb, 3),
        "total_gb": round(step_bytes * gb, 3),
    }
    # NOTE: donate=False double-counts params+opt state across
    # argument/output; the live trainer donates, so the honest budget
    # uses max(arg, out) + temp.
    live_bytes = max(mem.argument_size_in_bytes,
                     mem.output_size_in_bytes) + mem.temp_size_in_bytes
    record["step"]["donated_live_gb"] = round(live_bytes * gb, 3)

    per_sample = H * W * 3 + H * W * 2          # rgb u8 + depth u16 (mm)
    shard_bytes = -(-N_SUNRGBD // N_CHIPS) * per_sample
    record["resident_shard"] = {
        "quantized_bytes_per_sample": per_sample,
        "full_sunrgbd_total_gb": round(N_SUNRGBD * per_sample * gb, 2),
        "per_chip_gb": round(shard_bytes * gb, 3),
        "n_chips": N_CHIPS,
    }
    total = live_bytes + shard_bytes
    record["per_chip_total_gb"] = round(total * gb, 3)
    record["fits_16gb_v5e"] = bool(total < HBM_BYTES)

    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=2)
    print(json.dumps(record, indent=2))
    assert record["fits_16gb_v5e"], (
        f"production per-chip footprint {total * gb:.2f} GB exceeds 16 GB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

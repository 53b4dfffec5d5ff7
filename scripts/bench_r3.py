#!/usr/bin/env python
"""Round-3 chip experiments (VERDICT r2 items 2 and 4).

Usage: python scripts/bench_r3.py <experiment> [out.json]
  prod      — production 480x640 geometry f96 re-bench with the two-pass
              warp (replaces the stale pre-warp 4.7 img/s figure)
  ceiling   — 480x640 baseline b16 ceiling experiments: norm=group,
              decoder_upsample=resize, and their combination, vs base
  ceiling240 — same knobs at the 240x320 headline setting
  width     — stem-width MXU-fill study f64/f96/f128 at both resolutions

Each line printed is one measurement; results also append to the JSON
file (default BENCH_R3.json) for PERF_NOTES.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def hard_sync(state):
    import jax

    leaf = jax.tree_util.tree_leaves(state.params)[0]
    np.asarray(leaf).ravel()[0]


def bench(architecture, batch, height, width, steps=20, warmup=3,
          windows=2, **model_kw):
    import jax

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
        "model": {"architecture": architecture, **model_kw},
        "optimization": {"optimizer": "adamw", "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "training": {"batch_size": batch, "use_amp": True},
        "data": {"compute_rays": True},
    })
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 100, 100))
    batch_dev = {k: jax.device_put(v)
                 for k, v in _example_batch(batch, height, width).items()}
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                               batch_dev)
    step = make_train_step(cfg, model, loss_fn, tx, donate=True)
    for _ in range(warmup):
        state, logs = step(state, batch_dev)
    hard_sync(state)
    best_ms = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, logs = step(state, batch_dev)
        hard_sync(state)
        best_ms = min(best_ms, (time.perf_counter() - t0) / steps * 1e3)
    return {"ms_per_step": round(best_ms, 1),
            "img_per_sec": round(batch / best_ms * 1e3, 1)}


def run(name):
    if name == "prod":
        cases = [
            ("geo_f96_480x640_b4_two_pass",
             dict(architecture="geometry_aware", batch=4, height=480,
                  width=640, init_features=96, pcl_warp="two_pass",
                  steps=10)),
            ("geo_f96_480x640_b4_two_pass_remat_highres",
             dict(architecture="geometry_aware", batch=4, height=480,
                  width=640, init_features=96, pcl_warp="two_pass",
                  remat="highres", steps=10)),
            ("geo_f96_480x640_b8_two_pass",
             dict(architecture="geometry_aware", batch=8, height=480,
                  width=640, init_features=96, pcl_warp="two_pass",
                  steps=10)),
            ("geo_f96_480x640_b8_two_pass_remat_highres",
             dict(architecture="geometry_aware", batch=8, height=480,
                  width=640, init_features=96, pcl_warp="two_pass",
                  remat="highres", steps=10)),
        ]
    elif name == "prod2":
        cases = [
            ("geo_f96_480x640_b12_two_pass",
             dict(architecture="geometry_aware", batch=12, height=480,
                  width=640, init_features=96, pcl_warp="two_pass",
                  steps=10)),
            ("geo_f96_480x640_b16_two_pass",
             dict(architecture="geometry_aware", batch=16, height=480,
                  width=640, init_features=96, pcl_warp="two_pass",
                  steps=10)),
            ("geo_f96_480x640_b16_two_pass_remat_highres",
             dict(architecture="geometry_aware", batch=16, height=480,
                  width=640, init_features=96, pcl_warp="two_pass",
                  remat="highres", steps=10)),
        ]
    elif name == "ceiling":
        base = dict(architecture="baseline_unet", batch=16, height=480,
                    width=640, init_features=64, steps=10)
        cases = [
            ("base480_b16", dict(base)),
            ("base480_b16_groupnorm", dict(base, norm="group")),
            ("base480_b16_resizedec", dict(base,
                                           decoder_upsample="resize")),
            ("base480_b16_group_resize", dict(base, norm="group",
                                              decoder_upsample="resize")),
        ]
    elif name == "ceiling240":
        base = dict(architecture="baseline_unet", batch=16, height=240,
                    width=320, init_features=64, steps=30)
        cases = [
            ("base240_b16", dict(base)),
            ("base240_b16_groupnorm", dict(base, norm="group")),
            ("base240_b16_resizedec", dict(base,
                                           decoder_upsample="resize")),
            ("base240_b16_group_resize", dict(base, norm="group",
                                              decoder_upsample="resize")),
        ]
    elif name == "widthgeo":
        # MXU-fill study on the flagship family: does the f64->f128
        # FLOP-efficiency gain hold with FiLM/CBAM/PCL in the mix?
        base = dict(architecture="geometry_aware", batch=16, height=240,
                    width=320, pcl_warp="two_pass", steps=10)
        cases = [
            ("geo240_b16_f96_two_pass", dict(base, init_features=96)),
            ("geo240_b16_f128_two_pass", dict(base, init_features=128)),
        ]
    elif name == "width":
        cases = [
            ("base240_b16_f96", dict(architecture="baseline_unet", batch=16,
                                     height=240, width=320,
                                     init_features=96, steps=20)),
            ("base240_b16_f128", dict(architecture="baseline_unet", batch=16,
                                      height=240, width=320,
                                      init_features=128, steps=20)),
            ("base480_b8_f96", dict(architecture="baseline_unet", batch=8,
                                    height=480, width=640,
                                    init_features=96, steps=10)),
        ]
    else:
        raise SystemExit(f"unknown experiment {name}")

    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_R3.json"
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    for label, kw in cases:
        try:
            r = bench(**kw)
        except Exception as exc:  # noqa: BLE001 - record and continue
            r = {"error": repr(exc)[:300]}
        print(label, r, flush=True)
        results[label] = r
        json.dump(results, open(out_path, "w"), indent=2)


if __name__ == "__main__":
    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    run(sys.argv[1])

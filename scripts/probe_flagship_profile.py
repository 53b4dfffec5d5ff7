#!/usr/bin/env python
"""Whole-step accounting of the flagship train step (round 4, post-toeplitz).

Prints, for the geometry_aware f64 b16 240x320 step at the SHIPPED
defaults (pcl_warp=two_pass, sa_lowering=toeplitz):

  - XLA cost_analysis FLOPs -> achieved TFLOP/s / % of bf16 peak
  - HLO copy-op byte total (the layout-churn metric from
    scripts/bench_layout.py modelhlo)
  - a jax.profiler device trace bucketed by op-name category

Usage: python scripts/probe_flagship_profile.py [out.json]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0


def build(batch=16, height=240, width=320, **model_kw):
    import jax

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss, build_optimizer, create_train_state,
        make_train_step)
    from __graft_entry__ import _example_batch

    cfg = config_from_dict({
        "model": {"architecture": "geometry_aware", **model_kw},
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
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)
    return step, state, batch_dev


def trace_categories(trace_dir):
    """Device-op ms bucketed by fusion/op category from the trace.json.gz."""
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return {}
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    buckets = collections.Counter()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        # TPU device tracks only: XLA ops carry a 'long_name'/hlo op
        if not args and "%" not in name and "fusion" not in name \
           and "copy" not in name and "convolution" not in name:
            continue
        key = name.split(".")[0].split("%")[-1]
        buckets[key] += ev["dur"] / 1e3  # us -> ms
    return dict(buckets.most_common(24))


def main():
    import jax

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_profile.json"
    step, state, batch = build()
    lowered = jax.jit(step).lower(state, batch)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))

    # byte-accurate copy accounting from the optimized HLO
    copy_bytes = 0
    n_copies = 0
    try:
        import re
        hlo = compiled.as_text()
        total = 0
        n = 0
        for line in hlo.splitlines():
            if "= " in line and " copy(" in line:
                shape = line.split("= ", 1)[1].split(" copy(", 1)[0].strip()
                m = re.match(r"(\w+)\[([\d,]*)\]", shape)
                if not m:
                    continue
                dt, dims = m.groups()
                nbytes = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4,
                          "u8": 1, "pred": 1, "f64": 8, "u32": 4}.get(dt, 4)
                cnt = 1
                for d in dims.split(","):
                    if d:
                        cnt *= int(d)
                total += cnt * nbytes
                n += 1
        copy_bytes, n_copies = total, n
    except Exception as exc:
        print("copy accounting failed:", exc, file=sys.stderr)

    # timed step (fenced by a one-element param readback)
    out = step(state, batch)
    float(jax.tree_util.tree_leaves(out[0].params)[0].ravel()[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        o = None
        for _ in range(10):
            o = step(state, batch)
        float(jax.tree_util.tree_leaves(o[0].params)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / 10 * 1e3)

    # profiler trace of 3 steps
    trace_dir = "/tmp/flagship_trace"
    with jax.profiler.trace(trace_dir):
        o = None
        for _ in range(3):
            o = step(state, batch)
        float(jax.tree_util.tree_leaves(o[0].params)[0].ravel()[0])
    cats = trace_categories(trace_dir)

    bsz = int(batch["rgb"].shape[0])
    tf_per_step = flops / 1e12
    res = {
        "ms_per_step": round(best, 2),
        "img_per_sec": round(bsz / best * 1e3, 1),
        "tflop_per_step": round(tf_per_step, 3),
        "achieved_tflops": round(tf_per_step / (best / 1e3), 1),
        "pct_of_bf16_peak": round(
            100 * tf_per_step / (best / 1e3) / V5E_BF16_PEAK_TFLOPS, 1),
        "hlo_copy_ops": n_copies,
        "hlo_copy_gb": round(copy_bytes / 1e9, 3),
        "trace_ms_by_category": {k: round(v, 2) for k, v in cats.items()},
    }
    print(json.dumps(res, indent=2), flush=True)
    json.dump(res, open(out_path, "w"), indent=2)


if __name__ == "__main__":
    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    main()

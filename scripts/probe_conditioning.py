#!/usr/bin/env python
"""Conditioning-sensitivity probe on a TRAINED checkpoint.

The reference's conditioning test (`tests/test_models.cpp:248-288`)
asserts an *untrained* IntrinsicsConditionedUNet produces different
outputs for different K. This probe is its training-time analogue
(VERDICT r4 item 3): load the checkpoint a convergence run produced,
run the forward with the true K4 and with perturbed K4s (focal scale,
principal-point shift), and report how much the prediction moves — a
trained FiLM pathway that ignores its conditioning would show ~0.

Usage:
    python scripts/probe_conditioning.py --config <yaml> \
        [--checkpoint latest|best|<dir>] [--platform cpu] \
        [--min-delta 1e-3]

Exit 0 iff the mean |Δdepth| under a 1.5x focal perturbation exceeds
--min-delta meters (and is finite).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--experiment", default="")
    p.add_argument("--checkpoint", default="latest")
    p.add_argument("--platform", default="")
    p.add_argument("--min-delta", type=float, default=1e-3,
                   help="Required mean |Δdepth| (m) under 1.5x focal scale")
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from cadepth_tpu.config import load_config
    from cadepth_tpu.data.sunrgbd import SunRGBDLoader
    from cadepth_tpu.models.factory import model_inputs
    from cadepth_tpu.training import (
        CheckpointManager,
        build_optimizer,
        create_train_state,
    )
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        _batch_with_rays,
        build_model_and_loss,
    )
    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.config, experiment=args.experiment or None)
    arch = cfg.model.architecture
    if arch == "baseline_unet":
        print("baseline_unet has no camera conditioning; nothing to probe",
              file=sys.stderr)
        return 2

    model, _ = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 1, 1))
    loader = SunRGBDLoader(
        cfg.data.data_dir, cfg.data.manifest_path, split=cfg.data.val_split,
        target_height=cfg.data.input_height,
        target_width=cfg.data.input_width,
        split_filtering=cfg.data.split_filtering,
        compute_rays=cfg.data.compute_rays)
    batch = jax.device_put(loader.get_batch(range(min(args.batch,
                                                      len(loader)))))
    state = create_train_state(cfg, model, tx,
                               jax.random.PRNGKey(cfg.experiment.seed), batch)
    mgr = CheckpointManager(
        str(Path(cfg.checkpointing.checkpoint_dir) / cfg.experiment.name))
    ckpt = (str(mgr.best_dir) if args.checkpoint == "best"
            else mgr.latest_checkpoint() if args.checkpoint == "latest"
            else args.checkpoint)
    if ckpt is None:
        print("no checkpoint found", file=sys.stderr)
        return 1
    state, meta = mgr.restore_with_meta(ckpt, state)
    print(f"loaded {ckpt} (epoch {meta.get('epoch', '?')})")

    needs_rays = arch.startswith("geometry_aware")

    @jax.jit
    def forward(batch):
        b = _batch_with_rays(dict(batch), needs_rays, cfg.data.compute_rays)
        a, kw = model_inputs(arch, b, train=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, *a, **kw)

    def perturbed(batch, fscale=1.0, cshift=0.0):
        b = dict(batch)
        k = np.asarray(b["intrinsics"]).copy()
        k[:, 0, 0] *= fscale
        k[:, 1, 1] *= fscale
        k[:, 0, 2] += cshift
        k[:, 1, 2] += cshift
        b["intrinsics"] = k
        k4 = np.stack([k[:, 0, 0], k[:, 1, 1], k[:, 0, 2], k[:, 1, 2]],
                      -1).astype(np.float32)
        b["k4"] = k4
        if "rays" in b and not cfg.data.compute_rays:
            del b["rays"]  # force re-derivation is unavailable; keep as-is
        return b

    base = np.asarray(forward(batch), np.float32)
    report = {"arch": arch, "checkpoint": str(ckpt),
              "mean_depth_m": float(np.mean(base))}
    for name, kw in [("focal_x1.5", dict(fscale=1.5)),
                     ("focal_x0.75", dict(fscale=0.75)),
                     ("principal_+16px", dict(cshift=16.0))]:
        out = np.asarray(forward(perturbed(batch, **kw)), np.float32)
        report[f"delta_{name}_m"] = float(np.mean(np.abs(out - base)))
    print(json.dumps(report, indent=2))

    delta = report["delta_focal_x1.5_m"]
    ok = np.isfinite(delta) and delta > args.min_delta
    print(f"CONDITIONING SENSITIVITY: {'PASSED' if ok else 'FAILED'} "
          f"(mean |Δdepth| {delta:.5f} m under 1.5x focal, "
          f"threshold {args.min_delta})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

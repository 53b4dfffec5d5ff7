#!/usr/bin/env python
"""Evaluation CLI.

Parity with the reference `./evaluate` binary
(`evaluate_main.cpp:286-298`):

    python cli/evaluate.py --checkpoint <dir> --config <yaml> \
        [--output results/] [--num-vis 8] [--colormap viridis] \
        [--no-vis] [--save-predictions] [--max-samples N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Camera-aware depth evaluation (TPU)")
    p.add_argument("--checkpoint", required=True,
                   help="Checkpoint directory (orbax) or 'best'/'latest' "
                        "relative to the config's checkpoint_dir")
    p.add_argument("--config", default="configs/train_config.yaml")
    p.add_argument("--experiment", default="")
    p.add_argument("--output", default="./evaluation_results")
    p.add_argument("--num-vis", type=int, default=8)
    p.add_argument("--colormap", default="viridis")
    p.add_argument("--no-vis", action="store_true")
    p.add_argument("--save-predictions", action="store_true")
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=0,
                   help="Eval batch size (0 = reference default of 1)")
    p.add_argument("--platform", default="",
                   help="Force a jax platform (e.g. 'cpu'); empty = default")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from cadepth_tpu.config import load_config
    from cadepth_tpu.data.sunrgbd import SunRGBDLoader
    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from cadepth_tpu.evaluation import EvaluationConfig, ModelEvaluator
    from cadepth_tpu.training import (
        CheckpointManager,
        build_optimizer,
        create_train_state,
    )
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import build_model_and_loss
    from cadepth_tpu.visualization.depth_viz import create_comparison

    cfg = load_config(args.config, experiment=args.experiment or None)
    model, _ = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 1, 1))

    loader_kw = dict(
        split=cfg.data.val_split,
        target_height=cfg.data.input_height, target_width=cfg.data.input_width,
        allowed_sensors=cfg.data.sensor_types or
        ["kv1", "kv2", "realsense", "xtion"],
        split_filtering=cfg.data.split_filtering,
        compute_rays=cfg.data.compute_rays,
        rays_on_device=cfg.data.compute_rays)
    if cfg.data.packed_dir:
        from cadepth_tpu.data.packed import PackedSunRGBDLoader

        loader = PackedSunRGBDLoader(cfg.data.packed_dir,
                                     preload=cfg.data.packed_preload,
                                     **loader_kw)
    else:
        loader = SunRGBDLoader(cfg.data.data_dir, cfg.data.manifest_path,
                               **loader_kw)

    sample_batch = jax.device_put(loader.get_batch(range(min(2, len(loader)))))
    state = create_train_state(cfg, model, tx,
                               jax.random.PRNGKey(cfg.experiment.seed),
                               sample_batch)

    ckpt_root = Path(cfg.checkpointing.checkpoint_dir) / cfg.experiment.name
    mgr = CheckpointManager(str(ckpt_root))
    if args.checkpoint == "best":
        ckpt_path = str(mgr.best_dir)
    elif args.checkpoint == "latest":
        ckpt_path = mgr.latest_checkpoint()
        if ckpt_path is None:
            print(f"No checkpoints under {ckpt_root}", file=sys.stderr)
            return 1
    else:
        ckpt_path = args.checkpoint
    state, meta = mgr.restore_with_meta(ckpt_path, state)
    print(f"Loaded checkpoint {ckpt_path} (epoch {meta.get('epoch', '?')})")

    evaluator = ModelEvaluator(cfg, model, state, EvaluationConfig(
        min_depth=cfg.validation.min_depth,
        max_depth=cfg.validation.max_depth,
        batch_size=args.batch_size or 1,
        colormap=args.colormap))
    result = evaluator.evaluate(
        loader, max_samples=args.max_samples or None,
        device_resident=bool(cfg.data.device_resident and
                             cfg.data.packed_dir))

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    report = ModelEvaluator.report(result, cfg.model.architecture)
    print(report)
    (out_dir / "report.txt").write_text(report)
    ModelEvaluator.write_csv(result, str(out_dir / "per_sample_metrics.csv"))
    ModelEvaluator.write_summary_csv(result, str(out_dir / "summary_metrics.csv"))

    if not args.no_vis and args.num_vis > 0:
        import cv2

        from cadepth_tpu.metrics.depth_metrics import (
            compute_depth_metrics_per_sample,
        )
        from cadepth_tpu.visualization.depth_viz import (
            create_comprehensive_visualization,
        )

        vis_dir = out_dir / "visualizations"
        vis_dir.mkdir(exist_ok=True)
        # uniform sampling over the dataset (evaluate_main.cpp:156-209)
        n = min(args.num_vis, len(loader))
        idx = np.linspace(0, len(loader) - 1, n).astype(int)
        batch = jax.device_put(loader.get_batch(idx))
        pred = np.asarray(evaluator.predict_fn(state, batch))
        per_sample = jax.tree_util.tree_map(
            np.asarray,
            compute_depth_metrics_per_sample(
                pred, np.asarray(batch["depth"]),
                min_depth=cfg.validation.min_depth,
                max_depth=cfg.validation.max_depth))
        for j in range(n):
            rgb_j = np.asarray(batch["rgb"][j])
            gt_j = np.asarray(batch["depth"][j])
            panel = create_comparison(rgb_j, gt_j, pred[j],
                                      colormap=args.colormap)
            cv2.imwrite(str(vis_dir / f"comparison_{j:03d}.png"),
                        cv2.cvtColor(panel, cv2.COLOR_RGB2BGR))
            # per-sample report image (depth_visualizer.h:259-290 /
            # evaluate_main.cpp:156-209)
            full = create_comprehensive_visualization(
                rgb_j, gt_j, pred[j],
                {k: float(v[j]) for k, v in per_sample.items()},
                min_depth=cfg.validation.min_depth,
                max_depth=cfg.validation.max_depth, colormap=args.colormap)
            cv2.imwrite(str(vis_dir / f"comprehensive_{j:03d}.png"),
                        cv2.cvtColor(full, cv2.COLOR_RGB2BGR))
        print(f"Saved {n} visualizations to {vis_dir}")

    if args.save_predictions:
        pred_dir = out_dir / "predictions"
        pred_dir.mkdir(exist_ok=True)
        from cadepth_tpu.visualization.depth_viz import save_depth_image

        n = min(result.num_samples, len(loader))
        chunk = max(args.batch_size or 1, 1)
        saved = 0
        for start in range(0, n, chunk):
            idx = range(start, min(start + chunk, n))
            batch = jax.device_put(loader.get_batch(idx))
            preds = np.asarray(evaluator.predict_fn(state, batch))
            for j in range(preds.shape[0]):
                save_depth_image(
                    str(pred_dir / f"pred_{start + j:04d}.png"), preds[j],
                    colormap=args.colormap,
                    min_depth=0.0, max_depth=cfg.validation.max_depth)
                saved += 1
        print(f"Saved {saved} predictions to {pred_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

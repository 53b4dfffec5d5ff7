#!/usr/bin/env python
"""Single-image depth inference.

Serving-path utility beyond the reference's surface (it only exposes
batch evaluation): load a checkpoint, read an RGB image (+ optional
intrinsics.txt), predict depth, write a 16-bit depth PNG (millimeters,
SUN RGB-D convention), a colormapped visualization, and optionally a
raw .npy.

    python cli/infer.py --checkpoint best --config configs/train_config.yaml \
        --image path/to/rgb.jpg [--intrinsics path/to/intrinsics.txt] \
        [--output out_dir] [--colormap viridis] [--save-npy]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Single-image depth inference")
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir, or 'best'/'latest'")
    p.add_argument("--config", default="configs/train_config.yaml")
    p.add_argument("--experiment", default="")
    p.add_argument("--image", required=True, help="RGB image path")
    p.add_argument("--intrinsics", default="",
                   help="intrinsics.txt (9 floats); defaults to a centered "
                        "pinhole with f = image width")
    p.add_argument("--output", default="./inference_out")
    p.add_argument("--colormap", default="viridis")
    p.add_argument("--save-npy", action="store_true")
    p.add_argument("--export-stablehlo", default="",
                   help="Also serialize the (batch-1) inference program with "
                        "params baked in to this path (jax.export; reload "
                        "with cadepth_tpu.inference.load_exported)")
    p.add_argument("--platform", default="")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import cv2
    import numpy as np

    from cadepth_tpu.config import load_config
    from cadepth_tpu.geometry.io import load_intrinsics_txt
    from cadepth_tpu.training import CheckpointManager, build_optimizer
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        create_train_state,
        make_predict_fn,
    )
    from cadepth_tpu.utils import enable_compilation_cache
    from cadepth_tpu.visualization.depth_viz import save_depth_image

    enable_compilation_cache()
    cfg = load_config(args.config, experiment=args.experiment or None)

    bgr = cv2.imread(args.image, cv2.IMREAD_COLOR)
    if bgr is None:
        print(f"Cannot read image: {args.image}", file=sys.stderr)
        return 1
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    h0, w0 = rgb.shape[:2]

    if args.intrinsics:
        k = load_intrinsics_txt(args.intrinsics)
    else:
        k = np.array([[w0, 0, w0 / 2.0], [0, w0, h0 / 2.0], [0, 0, 1]],
                     np.float32)
        print(f"No intrinsics given; assuming f={w0}px centered pinhole")

    th, tw = cfg.data.input_height, cfg.data.input_width
    rgb_r = cv2.resize(rgb, (tw, th), interpolation=cv2.INTER_LINEAR)
    sx, sy = tw / w0, th / h0
    k = k.copy()
    k[0, 0] *= sx
    k[1, 1] *= sy
    k[0, 2] *= sx
    k[1, 2] *= sy

    batch = {
        "rgb": rgb_r[None],
        "depth": np.zeros((1, th, tw, 1), np.float32),
        "intrinsics": k[None].astype(np.float32),
        "k4": np.array([[k[0, 0], k[1, 1], k[0, 2], k[1, 2]]], np.float32),
    }
    batch = jax.device_put(batch)

    model, _ = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 1, 1))
    state = create_train_state(cfg, model, tx,
                               jax.random.PRNGKey(cfg.experiment.seed), batch)

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

    predict = make_predict_fn(cfg, model)
    depth = np.asarray(predict(state, batch))[0]  # (th, tw, 1) meters
    # back to the input resolution, nearest (no depth mixing)
    depth_full = cv2.resize(depth[..., 0], (w0, h0),
                            interpolation=cv2.INTER_NEAREST)

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    stem = Path(args.image).stem
    cv2.imwrite(str(out / f"{stem}_depth.png"),
                np.clip(depth_full * 1000.0, 0, 65535).astype(np.uint16))
    save_depth_image(str(out / f"{stem}_depth_vis.png"), depth_full,
                     colormap=args.colormap, min_depth=0.0,
                     max_depth=cfg.model.max_depth)
    if args.save_npy:
        np.save(out / f"{stem}_depth.npy", depth_full)
    print(f"Depth: min={depth_full.min():.2f}m max={depth_full.max():.2f}m "
          f"mean={depth_full.mean():.2f}m")
    print(f"Wrote {out}/{stem}_depth.png (16-bit mm) and {stem}_depth_vis.png")

    if args.export_stablehlo:
        from cadepth_tpu.inference import Predictor

        predictor = Predictor(cfg, state, batch_size=1)
        nbytes = predictor.export_stablehlo(args.export_stablehlo)
        print(f"Exported StableHLO artifact ({nbytes / 2**20:.1f} MiB) "
              f"to {args.export_stablehlo}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

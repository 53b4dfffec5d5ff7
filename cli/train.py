#!/usr/bin/env python
"""Training CLI.

Parity with the reference `./train` binary (`train_main.cpp:35-55`):

    python cli/train.py --config configs/train_config.yaml \
        [--experiment geometry_aware_full] [--resume latest|<path>] \
        [--debug] [--tensorboard true|false] [--devices N]

Unlike the reference — whose live path hardcodes BaselineUNet
(`train_main.cpp:324-333`) — the model factory is honored, so every
architecture in the config trains.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Camera-aware depth training (TPU)")
    p.add_argument("--config", default="configs/train_config.yaml",
                   help="Path to YAML config")
    p.add_argument("--experiment", default="",
                   help="Named experiment override block")
    p.add_argument("--resume", default="",
                   help="'latest' or a checkpoint path")
    p.add_argument("--debug", action="store_true",
                   help="Tiny run for debugging")
    p.add_argument("--tensorboard", default="true", choices=["true", "false"],
                   help="Enable TensorBoard event writing")
    p.add_argument("--devices", type=int, default=0,
                   help="Number of devices for data parallelism (0 = all)")
    p.add_argument("--profile", action="store_true",
                   help="Capture a jax.profiler trace of the first epoch")
    p.add_argument("--nan-check", action="store_true",
                   help="Enable jax NaN debugging (slow)")
    p.add_argument("--platform", default="",
                   help="Force a jax platform (e.g. 'cpu'); empty = default")
    p.add_argument("--multihost", action="store_true",
                   help="Initialize the multi-process JAX runtime "
                        "(jax.distributed.initialize) — run the same "
                        "command on every host of the pod/cluster")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.multihost:
        # must precede any other JAX usage in this process
        from cadepth_tpu.parallel import initialize_distributed

        initialize_distributed()

    from cadepth_tpu.config import load_config
    from cadepth_tpu.training.trainer import Trainer
    from cadepth_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = load_config(args.config, experiment=args.experiment or None,
                      debug=args.debug)
    if args.resume:
        cfg.checkpointing.resume_from = args.resume
    if args.tensorboard == "false":
        cfg.logging.tensorboard_enabled = False
    if args.devices:
        cfg.hardware.num_devices = args.devices

    import jax
    import numpy as np

    np.random.seed(cfg.experiment.seed)
    print(f"JAX backend: {jax.default_backend()}, "
          f"devices: {len(jax.devices())}")

    if args.nan_check:
        from cadepth_tpu.utils import enable_nan_debugging

        enable_nan_debugging()

    trainer = Trainer(cfg)
    try:
        if args.profile:
            # traces the FIRST training epoch in-place (no extra epoch that
            # would advance the optimizer/LR schedule before the real run)
            trainer.profile_dir = str(trainer.log_dir / "profile")
        metrics = trainer.train()
    finally:
        trainer.close()
    if metrics:
        from cadepth_tpu.metrics import format_metrics
        print(format_metrics(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

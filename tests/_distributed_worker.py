"""Subprocess worker for the real 2-process `jax.distributed` test
(tests/test_parallel.py::test_two_process_distributed_dp_step).

Each worker is one *process* of a 2-process job (4 virtual CPU devices
each -> 8 global devices): it joins the coordinator via
`initialize_distributed`, builds the per-process-sliced InputPipeline
(`data/pipeline.py` process_index/process_count +
`make_array_from_process_local_data`), takes ONE global DP train step,
and process 0 writes the loss + a parameter fingerprint for the parent
to compare against a single-process 8-device oracle.

This is the `cli/train.py --multihost` execution path the reference
could never have (its `distributed:` YAML block is dead config —
`/root/reference/configs/train_config.yaml:176-183`, SURVEY §2.9).
"""

import json
import os
import sys


def main() -> None:
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    data_dir = sys.argv[3]
    manifest = sys.argv[4]
    out_path = sys.argv[5]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cadepth_tpu.parallel import initialize_distributed

    assert initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=process_id), "distributed init failed"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.data.pipeline import InputPipeline
    from cadepth_tpu.data.sunrgbd import SunRGBDLoader
    from cadepth_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicate_state,
    )
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        build_optimizer,
        create_train_state,
        make_train_step,
    )
    from __graft_entry__ import _example_batch

    # fp32 + SGD so the parent's elementwise param comparison is
    # meaningful (same rationale as test_dp_matches_single_device).
    cfg = config_from_dict({
        "model": {"architecture": "baseline_unet", "init_features": 4},
        "optimization": {"optimizer": "sgd", "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "training": {"batch_size": 8, "use_amp": False},
        "data": {"compute_rays": True},
    })
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 1, 1))

    mesh = make_mesh()  # all 8 GLOBAL devices
    loader = SunRGBDLoader(os.path.join(data_dir, "sunrgbd"), manifest,
                           split="train", target_height=32, target_width=32,
                           compute_rays=True)
    # shuffle=False + no augmentation: every process sees the same
    # deterministic global order and slices out its half of each batch.
    pipe = InputPipeline(loader, batch_size=8, shuffle=False,
                         sharding=batch_sharding(mesh), num_threads=2,
                         prefetch_depth=1)
    assert pipe.process_count == 2 and pipe._local_bs == 4
    batch = next(iter(pipe))
    assert batch["rgb"].shape[0] == 8          # global batch
    assert len(batch["rgb"].addressable_shards) == 4  # local shards only

    init_batch = {k: np.asarray(v)
                  for k, v in _example_batch(8, 32, 32).items()}
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                               init_batch)
    state = replicate_state(state, mesh)
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)
    new_state, logs = step(state, batch)
    jax.block_until_ready(new_state.params)
    loss = float(logs["total_loss"])           # replicated -> addressable

    if process_id == 0:
        leaves = jax.tree_util.tree_leaves(new_state.params)
        fingerprint = float(sum(float(np.abs(np.asarray(l)).sum())
                                for l in leaves))
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "param_l1": fingerprint,
                       "n_leaves": len(leaves)}, f)
    print(f"worker {process_id}: ok, loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()

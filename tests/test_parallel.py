"""Data-parallel mesh: sharding helpers, multi-chip dry run, DP-vs-single
numerical equivalence on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cadepth_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    replicate_state,
)


def test_make_mesh_sizes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh4 = make_mesh(4)
    assert mesh4.devices.size == 4
    assert mesh4.axis_names == ("data",)


def test_shard_and_replicate():
    mesh = make_mesh(4)
    batch = {"x": jnp.ones((8, 4)), "y": jnp.ones((8,))}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
    assert len(sharded["x"].addressable_shards) == 4
    state = {"w": jnp.ones((3, 3))}
    replicated = replicate_state(state, mesh)
    assert replicated["w"].sharding.is_equivalent_to(replicate_sharding(mesh),
                                                     ndim=2)


def test_dryrun_multichip_entrypoint():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dp_matches_single_device():
    """The same train step over a sharded batch must produce the same
    params as unsharded execution (global BatchNorm + psum'd grads under
    jit-SPMD are exact, not approximate)."""
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
        "model": {"architecture": "baseline_unet", "init_features": 4},
        # SGD: Adam's rsqrt(v)+eps amplifies benign 1e-6 reduction-order
        # noise unboundedly where v ~ 0, which would make elementwise
        # param comparison meaningless.
        "optimization": {"optimizer": "sgd", "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "training": {"batch_size": 8, "use_amp": False},  # fp32 for exactness
        "data": {"compute_rays": True},
    })
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, build_lr_schedule(cfg.optimization, 1, 1))
    batch = {k: jnp.asarray(v) for k, v in _example_batch(8, 32, 32).items()}
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)

    state0 = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    single_state, single_logs = step(state0, batch)

    mesh = make_mesh(4)
    state_r = replicate_state(
        create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch), mesh)
    dp_state, dp_logs = step(state_r, shard_batch(batch, mesh))

    assert float(single_logs["total_loss"]) == pytest.approx(
        float(dp_logs["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(single_state.params),
                    jax.tree_util.tree_leaves(dp_state.params)):
        # cross-device reduction order perturbs fp32 grad sums at ~1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_initialize_distributed_single_process_fallback():
    """Without a coordinator/pod environment, initialization degrades
    gracefully to single-process (returns False, no exception)."""
    from cadepth_tpu.parallel import initialize_distributed

    assert initialize_distributed() in (False, True)  # no raise
    # single CPU test env: jax still works afterwards
    import jax

    assert len(jax.devices()) >= 1


def test_spatial_sharding_matches_single_device(dataset_batch_factory=None):
    """2-D data x space mesh: XLA partitions the convs spatially (halo
    exchanges inserted automatically); the step must match the
    unsharded result."""
    import jax
    import jax.numpy as jnp

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.parallel import (batch_shardings, make_mesh_2d,
                                      replicate_sharding)
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        build_optimizer,
        create_train_state,
        make_train_step,
    )
    from __graft_entry__ import _example_batch

    cfg = config_from_dict({
        "model": {"architecture": "baseline_unet", "init_features": 4},
        "optimization": {"optimizer": "adamw", "lr_scheduler": "none",
                         "lr_warmup_epochs": 0},
        "training": {"batch_size": 2, "use_amp": True},
        "data": {"compute_rays": True},
    })
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 10, 10))
    batch = {k: jnp.asarray(v) for k, v in _example_batch(2, 64, 64).items()}
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)

    mesh = make_mesh_2d(8, spatial=4)
    assert mesh.devices.shape == (2, 4)
    table = batch_shardings(mesh)
    batch_s = {k: jax.device_put(v, table[k]) for k, v in batch.items()}
    state_s = jax.device_put(state, replicate_sharding(mesh))

    new_s, logs_s = step(state_s, batch_s)
    new_r, logs_r = step(state, batch)
    assert abs(float(logs_s["total_loss"]) - float(logs_r["total_loss"])) < 1e-4
    leaves_s = jax.tree_util.tree_leaves(new_s.params)
    leaves_r = jax.tree_util.tree_leaves(new_r.params)
    import numpy as np

    for ls, lr in zip(leaves_s, leaves_r):
        np.testing.assert_allclose(np.asarray(ls, np.float32),
                                   np.asarray(lr, np.float32),
                                   atol=5e-3)

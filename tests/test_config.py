"""Config loading, experiment overrides, debug mode."""

import textwrap

import pytest

from cadepth_tpu.config import load_config, config_from_dict, config_to_dict

YAML = textwrap.dedent("""
experiment:
  name: "baseline_unet"
  tags: ["baseline"]
data:
  input_height: 240
  input_width: 320
  augmentation:
    brightness: 0.3
model:
  architecture: "baseline_unet"
  init_features: 64
optimization:
  optimizer: "adamw"
  learning_rate: 1.0e-4
  lr_scheduler: "step"
loss:
  si_weight: 1.0
  reproj_weight: 0.01
training:
  num_epochs: 50
  batch_size: 8
reproducibility:
  seed: 123
experiments:
  baseline_small:
    model:
      init_features: 32
    training:
      batch_size: 16
  geometry_aware_full:
    model:
      architecture: "geometry_aware"
      variant: "full"
    experiment:
      name: "geometry_aware_full"
    training:
      batch_size: 4
debug:
  enabled: false
  num_train_samples: 100
  num_val_samples: 50
  num_epochs: 2
  log_interval: 1
""")


@pytest.fixture
def config_path(tmp_path):
    p = tmp_path / "train_config.yaml"
    p.write_text(YAML)
    return str(p)


def test_base_config(config_path):
    cfg = load_config(config_path)
    assert cfg.experiment.name == "baseline_unet"
    assert cfg.experiment.seed == 123
    assert cfg.data.input_height == 240
    assert cfg.data.augmentation.brightness == 0.3
    assert cfg.model.init_features == 64
    assert cfg.optimization.optimizer == "adamw"
    assert cfg.training.batch_size == 8


def test_experiment_override(config_path):
    cfg = load_config(config_path, experiment="baseline_small")
    assert cfg.model.init_features == 32
    assert cfg.training.batch_size == 16
    assert cfg.model.architecture == "baseline_unet"  # unchanged

    cfg2 = load_config(config_path, experiment="geometry_aware_full")
    assert cfg2.model.architecture == "geometry_aware"
    assert cfg2.experiment.name == "geometry_aware_full"
    assert cfg2.training.batch_size == 4


def test_unknown_experiment_raises(config_path):
    with pytest.raises(KeyError) as err:
        load_config(config_path, experiment="nope")
    assert "baseline_small" in str(err.value)


def test_debug_override(config_path):
    cfg = load_config(config_path, debug=True)
    assert cfg.training.num_epochs == 2
    assert cfg.training.log_interval == 1
    assert cfg._debug_limits["num_train_samples"] == 100


def test_defaults_from_empty():
    cfg = config_from_dict({})
    assert cfg.model.architecture == "baseline_unet"
    assert cfg.loss.si_weight == 1.0
    assert cfg.validation.primary_metric == "abs_rel"
    d = config_to_dict(cfg)
    assert d["model"]["architecture"] == "baseline_unet"


def test_logging_bool_shorthand():
    # `tensorboard: false` / `csv: true` accepted alongside the
    # reference's nested {enabled: ...} blocks
    cfg = config_from_dict({"logging": {"tensorboard": False, "csv": True}})
    assert cfg.logging.tensorboard_enabled is False
    assert cfg.logging.csv_enabled is True
    cfg = config_from_dict(
        {"logging": {"tensorboard": {"enabled": True,
                                     "log_scalar_interval": 3}}})
    assert cfg.logging.tensorboard_enabled is True
    assert cfg.logging.log_scalar_interval == 3


def test_model_sa_lowering_knob():
    cfg = config_from_dict({"model": {"sa_lowering": "conv"}})
    assert cfg.model.sa_lowering == "conv"
    assert config_from_dict({}).model.sa_lowering == "toeplitz"
    with pytest.raises(ValueError):
        config_from_dict({"model": {"sa_lowering": "winograd"}})


def test_reference_config_loads():
    # the reference's shipped YAML should map cleanly
    cfg = load_config("/root/reference/configs/train_config.yaml")
    assert cfg.training.num_epochs == 50
    assert cfg.optimization.lr_scheduler == "step"
    assert cfg.loss.reproj_weight == 0.01
    cfg2 = load_config("/root/reference/configs/train_config.yaml",
                       experiment="geometry_aware_lightweight")
    assert cfg2.model.architecture == "geometry_aware"
    assert cfg2.model.variant == "lightweight"


def test_use_attention_per_arch_defaults():
    """train_main.cpp: use_attention defaults false for intrinsics_unet,
    true for geometry_aware."""
    cfg_i = config_from_dict({"model": {"architecture": "intrinsics_unet"}})
    assert cfg_i.model.use_attention is False
    cfg_g = config_from_dict({"model": {"architecture": "geometry_aware"}})
    assert cfg_g.model.use_attention is True


def test_model_pcl_warp_and_remat_knobs():
    from cadepth_tpu.config import config_from_dict

    cfg = config_from_dict({"model": {"architecture": "geometry_aware",
                                      "pcl_warp": "two_pass",
                                      "remat": "highres"}})
    assert cfg.model.pcl_warp == "two_pass"
    assert cfg.model.remat == "highres"
    # defaults (round 3: two_pass — the GEMM warp with the documented
    # sub-pixel rotation bound — replaced "auto" as the default)
    cfg2 = config_from_dict({})
    assert cfg2.model.pcl_warp == "two_pass"
    assert cfg2.model.remat is False


def test_round2_knobs_parse():
    """Schema regression: the round-2 data/checkpointing knobs."""
    cfg = config_from_dict({
        "data": {"packed_dir": "/p", "packed_preload": True,
                 "device_resident": True,
                 "device_resident_dtype": "bfloat16"},
        "checkpointing": {"async_save": True,
                          "save_on_preemption": False},
    })
    assert cfg.data.packed_preload is True
    assert cfg.data.device_resident is True
    assert cfg.data.device_resident_dtype == "bfloat16"
    assert cfg.checkpointing.async_save is True
    assert cfg.checkpointing.save_on_preemption is False
    d = config_from_dict({})
    assert d.data.packed_preload is False
    assert d.data.device_resident is False
    assert d.data.device_resident_dtype == "float32"
    assert d.checkpointing.async_save is False
    assert d.checkpointing.save_on_preemption is True


def test_all_shipped_configs_load():
    """Every YAML in configs/ must parse through the schema (catches
    drift when new knobs are documented in the shipped files)."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(root, "train_config*.yaml")))
    assert len(files) >= 4
    for f in files:
        load_config(f)


def test_tpu_efficient_config():
    """The round-3 MXU-filling variant: f128 stem + device-resident
    data (PERF_NOTES '50%-of-peak ceiling' width study)."""
    import os

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "train_config_tpu.yaml"))
    assert cfg.model.architecture == "baseline_unet"
    assert cfg.model.init_features == 128
    assert cfg.data.device_resident is True
    assert cfg.training.use_amp is True
    assert cfg.optimization.lr_scheduler == "cosine"


def test_distributed_false_disables_data_parallel():
    """ADVICE r1: 'hardware: distributed: false' must be honored."""
    from cadepth_tpu.config import config_from_dict

    cfg = config_from_dict({"hardware": {"distributed": False}})
    assert cfg.hardware.data_parallel is False

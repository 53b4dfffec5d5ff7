"""CLI smoke tests via subprocess (CPU platform, tiny configs)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from cadepth_tpu.data import generate_synthetic_dataset

    root = tmp_path_factory.mktemp("cli_fixture")
    manifest = generate_synthetic_dataset(root, images_per_sensor=2, seed=2)
    return str(root), manifest


@pytest.fixture(scope="module")
def tiny_yaml(dataset, tmp_path_factory):
    root, manifest = dataset
    out = tmp_path_factory.mktemp("cli_cfg")
    cfg = f"""
experiment:
  name: "cli_test"
data:
  data_dir: "{root}/sunrgbd"
  manifest_path: "{manifest}"
  input_height: 32
  input_width: 32
model:
  architecture: "baseline_unet"
  init_features: 4
optimization:
  lr_scheduler: "none"
  lr_warmup_epochs: 0
training:
  num_epochs: 1
  batch_size: 4
  num_workers: 2
  num_vis_samples: 0
checkpointing:
  checkpoint_dir: "{out}/ckpts"
  save_interval: 1
logging:
  log_dir: "{out}/logs"
  tensorboard:
    enabled: false
hardware:
  data_parallel: false
early_stopping:
  enabled: false
"""
    path = out / "config.yaml"
    path.write_text(cfg)
    return str(path), out


def run_cli(script, *args, timeout=600):
    return subprocess.run(
        [sys.executable, str(REPO / "cli" / script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO)


def test_validate_cli(dataset, tmp_path):
    root, _ = dataset
    out = tmp_path / "m.json"
    r = run_cli("validate_sunrgbd.py", f"{root}/sunrgbd", str(out))
    assert r.returncode == 0, r.stderr
    assert "Valid images: 8/8" in r.stdout
    assert json.loads(out.read_text())["valid_images"] == 8


def test_preprocess_rays_cli(dataset):
    root, _ = dataset
    r = run_cli("preprocess_rays.py", "--data_dir", f"{root}/sunrgbd",
                "--native-resolution", "--platform", "cpu")
    assert r.returncode == 0, r.stderr
    assert "Wrote 8 rays.bin files" in r.stdout


def test_train_then_evaluate_cli(tiny_yaml):
    cfg_path, out = tiny_yaml
    r = run_cli("train.py", "--config", cfg_path, "--platform", "cpu",
                "--tensorboard", "false")
    assert r.returncode == 0, r.stderr[-2000:]
    assert (Path(out) / "logs" / "cli_test" / "metrics.csv").exists()

    r2 = run_cli("evaluate.py", "--checkpoint", "latest", "--config", cfg_path,
                 "--platform", "cpu", "--output", str(Path(out) / "eval"),
                 "--no-vis", "--batch-size", "4")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Evaluation report" in r2.stdout
    assert (Path(out) / "eval" / "per_sample_metrics.csv").exists()


def test_train_cli_unknown_experiment(tiny_yaml):
    cfg_path, _ = tiny_yaml
    r = run_cli("train.py", "--config", cfg_path, "--experiment", "nope",
                "--platform", "cpu")
    assert r.returncode != 0
    assert "not found" in r.stderr


def test_compare_models_cli(tiny_yaml):
    cfg_path, out = tiny_yaml
    eval_dir = Path(out) / "eval"
    if not eval_dir.exists():
        pytest.skip("evaluate output missing (ordering)")
    r = run_cli("compare_models.py", str(eval_dir), str(eval_dir))
    assert r.returncode == 0, r.stderr
    assert "Statistical comparison" in r.stdout


def test_infer_cli(tiny_yaml, dataset, tmp_path):
    cfg_path, out = tiny_yaml
    ckpts = Path(out) / "ckpts" / "cli_test"
    if not ckpts.exists():
        pytest.skip("train checkpoint missing (ordering)")
    root, _ = dataset
    # use a fixture RGB + its intrinsics
    scene = sorted(Path(f"{root}/sunrgbd/kv1").iterdir())[0]
    img = next((scene / "image").iterdir())
    r = run_cli("infer.py", "--checkpoint", "latest", "--config", cfg_path,
                "--image", str(img), "--intrinsics",
                str(scene / "intrinsics.txt"),
                "--output", str(tmp_path / "inf"), "--platform", "cpu",
                "--save-npy")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Depth: min=" in r.stdout
    outs = list((tmp_path / "inf").iterdir())
    assert len(outs) == 3  # depth.png, vis.png, npy


def test_pack_dataset_cli(dataset, tmp_path):
    root, manifest = dataset
    out = tmp_path / "pack"
    r = run_cli("pack_dataset.py", "--data-dir", f"{root}/sunrgbd",
                "--manifest", manifest, "--out", str(out),
                "--height", "32", "--width", "32")
    assert r.returncode == 0, r.stderr
    assert "Packed 8 samples" in r.stdout

    from cadepth_tpu.data import PackedSunRGBDLoader

    loader = PackedSunRGBDLoader(str(out))
    assert len(loader) == 8
    assert loader.get_sample(0)["rgb"].shape == (32, 32, 3)

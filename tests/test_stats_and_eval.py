"""Statistical tests (vs scipy oracle), experiment comparison, evaluator."""

import numpy as np
import pytest

from cadepth_tpu.metrics import (
    paired_t_test,
    wilcoxon_signed_rank,
    cohens_d,
    bootstrap_confidence_interval,
    compare_models,
    ExperimentResult,
    to_markdown_table,
    to_latex_table,
    ablation_analysis,
    rank_results,
    best_result,
    to_csv,
    from_csv,
    full_report,
)


def test_paired_t_test_vs_scipy(rng):
    from scipy import stats

    a = rng.normal(1.0, 0.2, size=200)
    b = a + rng.normal(0.05, 0.1, size=200)
    got = paired_t_test(a, b)
    want = stats.ttest_rel(a, b)
    assert got.statistic == pytest.approx(want.statistic, rel=1e-6)
    # normal approximation of the p-value: close for n=200
    assert got.p_value == pytest.approx(want.pvalue, abs=5e-3)
    assert got.significant


def test_t_test_identical_samples():
    a = np.ones(10)
    r = paired_t_test(a, a)
    assert r.p_value == 1.0
    assert not r.significant


def test_wilcoxon_vs_scipy(rng):
    from scipy import stats

    a = rng.normal(1.0, 0.2, size=100)
    b = a + rng.normal(0.1, 0.2, size=100)
    got = wilcoxon_signed_rank(a, b)
    want = stats.wilcoxon(a, b, correction=False, mode="approx")
    assert got.statistic == pytest.approx(want.statistic, rel=1e-6)
    assert got.p_value == pytest.approx(want.pvalue, abs=1e-3)


def test_cohens_d_known():
    a = np.asarray([1.0, 2.0, 3.0, 4.0])
    b = a + 1.0
    d = cohens_d(a, b)
    # equal variance, mean shift 1.0, pooled sd = std([1..4], ddof=1)
    assert d == pytest.approx(-1.0 / np.std(a, ddof=1), rel=1e-6)


def test_bootstrap_ci_contains_mean(rng):
    vals = rng.normal(5.0, 1.0, size=500)
    lo, hi = bootstrap_confidence_interval(vals, num_resamples=2000)
    assert lo < vals.mean() < hi
    assert hi - lo < 0.5


def test_compare_models_report(rng):
    a = {"abs_rel": list(rng.uniform(0.1, 0.2, 50))}
    b = {"abs_rel": list(rng.uniform(0.15, 0.25, 50))}
    report = compare_models("model_a", a, "model_b", b)
    assert "Paired t-test" in report
    assert "Wilcoxon" in report
    assert "Better: model_a" in report


RESULTS = [
    ExperimentResult("baseline_unet", {"abs_rel": 0.20, "rmse": 0.60,
                                       "delta_1.25": 0.75}, 31_000_000, 12.0),
    ExperimentResult("geometry_aware", {"abs_rel": 0.16, "rmse": 0.52,
                                        "delta_1.25": 0.82}, 36_000_000, 18.0),
]


def test_tables_and_ranking():
    md = to_markdown_table(RESULTS)
    assert "baseline_unet" in md and md.startswith("| Model |")
    tex = to_latex_table(RESULTS)
    assert r"\begin{tabular}" in tex and "geometry\\_aware" in tex
    ranked = rank_results(RESULTS, "abs_rel")
    assert ranked[0].name == "geometry_aware"
    ranked_acc = rank_results(RESULTS, "delta_1.25")
    assert ranked_acc[0].name == "geometry_aware"
    assert best_result(RESULTS, "rmse").name == "geometry_aware"


def test_ablation_analysis():
    text = ablation_analysis(RESULTS, "baseline_unet")
    assert "geometry_aware" in text
    assert "improved" in text
    with pytest.raises(ValueError):
        ablation_analysis(RESULTS, "nope")


def test_csv_roundtrip():
    text = to_csv(RESULTS)
    back = from_csv(text)
    assert back[0].name == "baseline_unet"
    assert back[1].metrics["abs_rel"] == pytest.approx(0.16)
    assert back[0].num_params == 31_000_000


def test_full_report():
    report = full_report(RESULTS, baseline_name="baseline_unet")
    assert "Best model by abs_rel: geometry_aware" in report
    assert "Ablation analysis" in report


def test_evaluator_end_to_end(tmp_path):
    import jax

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.data import SunRGBDLoader, generate_synthetic_dataset
    from cadepth_tpu.evaluation import EvaluationConfig, ModelEvaluator
    from cadepth_tpu.training import build_optimizer, create_train_state
    from cadepth_tpu.training.train_state import build_model_and_loss

    manifest = generate_synthetic_dataset(tmp_path, images_per_sensor=2)
    cfg = config_from_dict({
        "data": {"data_dir": f"{tmp_path}/sunrgbd", "manifest_path": manifest,
                 "input_height": 32, "input_width": 32},
        "model": {"architecture": "baseline_unet", "init_features": 4},
    })
    model, _ = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization, lambda s: 1e-4)
    loader = SunRGBDLoader(f"{tmp_path}/sunrgbd", manifest,
                           target_height=32, target_width=32)
    batch = jax.device_put(loader.get_batch([0, 1]))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)

    evaluator = ModelEvaluator(cfg, model, state,
                               EvaluationConfig(warmup_iterations=1,
                                                batch_size=4))
    result = evaluator.evaluate(loader)
    assert result.num_samples == 8
    assert len(result.per_sample) == 8
    assert result.fps > 0
    assert result.num_params > 0
    assert np.isfinite(result.mean_metrics["abs_rel"])
    assert np.isfinite(result.median_metrics["rmse"])

    csv_path = tmp_path / "per_sample.csv"
    ModelEvaluator.write_csv(result, str(csv_path))
    lines = csv_path.read_text().splitlines()
    assert len(lines) == 9
    summary_path = tmp_path / "summary.csv"
    ModelEvaluator.write_summary_csv(result, str(summary_path))
    assert "abs_rel" in summary_path.read_text()
    report = ModelEvaluator.report(result, "baseline_unet")
    assert "FPS" in report and "abs_rel" in report


def test_predictor_aot_serving(tmp_path):
    """AOT Predictor: compiled once, pads partial batches, matches the
    plain predict path, reports a latency distribution."""
    import numpy as np

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.inference import Predictor
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        build_optimizer,
        create_train_state,
        make_predict_fn,
    )

    cfg = config_from_dict({
        "data": {"input_height": 32, "input_width": 32},
        "model": {"architecture": "baseline_unet", "init_features": 4},
    })
    model, _ = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 1, 1))
    rng = np.random.default_rng(0)
    sample = {
        "rgb": rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32),
        "rays": np.zeros((4, 32, 32, 3), np.float32),
        "intrinsics": np.tile(np.eye(3, dtype=np.float32), (4, 1, 1)),
        "k4": np.ones((4, 4), np.float32),
    }
    import jax

    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                               jax.device_put(sample))
    predictor = Predictor(cfg, state, batch_size=4)

    rgb = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    out = predictor.predict(rgb)
    assert out.shape == (4, 32, 32, 1)
    want = np.asarray(make_predict_fn(cfg, model)(
        state, predictor._make_batch(rgb, None)))
    np.testing.assert_allclose(out, want, atol=1e-6)

    # partial batch: padded to the compiled size, padding rows dropped
    out2 = predictor.predict(rgb[:2])
    assert out2.shape == (2, 32, 32, 1)
    np.testing.assert_allclose(out2, out[:2], atol=1e-5)

    stats = predictor.benchmark(iterations=5, warmup=1)
    assert stats["p99_ms"] >= stats["p50_ms"] > 0
    assert stats["images_per_sec"] > 0

    # pipelined streaming keeps order and matches serial predict
    reqs = [rgb, rgb[:2], (rgb, np.tile(np.eye(3, dtype=np.float32),
                                        (4, 1, 1)))]
    outs = list(predictor.predict_stream(iter(reqs), depth=2))
    assert [o.shape[0] for o in outs] == [4, 2, 4]
    np.testing.assert_allclose(outs[0], out, atol=1e-6)
    np.testing.assert_allclose(outs[1], out[:2], atol=1e-5)

    # device-resident input path: no host staging, same result
    dev_rgb = jax.device_put(rgb)
    out_dev = predictor.predict(dev_rgb)
    np.testing.assert_allclose(out_dev, out, atol=1e-6)


def test_predictor_stablehlo_export_roundtrip(tmp_path):
    """export_stablehlo -> load_exported executes the serialized program
    (params baked in) and matches the live predictor bit-for-bit."""
    import numpy as np

    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.inference import Predictor, load_exported
    from cadepth_tpu.training.schedule import build_lr_schedule
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        build_optimizer,
        create_train_state,
    )

    cfg = config_from_dict({
        "data": {"input_height": 32, "input_width": 32},
        "model": {"architecture": "baseline_unet", "init_features": 4},
    })
    model, _ = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 1, 1))
    rng = np.random.default_rng(1)
    sample = {
        "rgb": rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32),
        "rays": np.zeros((2, 32, 32, 3), np.float32),
        "intrinsics": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
        "k4": np.ones((2, 4), np.float32),
    }
    import jax

    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0),
                               jax.device_put(sample))
    predictor = Predictor(cfg, state, batch_size=2)

    path = tmp_path / "model.stablehlo"
    nbytes = predictor.export_stablehlo(str(path))
    assert nbytes > 0 and path.stat().st_size == nbytes

    rgb = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    want = predictor.predict(rgb)
    fn = load_exported(str(path))
    got = np.asarray(fn(predictor._make_batch(rgb, None)))
    np.testing.assert_allclose(got, want, atol=1e-6)

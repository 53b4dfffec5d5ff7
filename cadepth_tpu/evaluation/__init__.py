from cadepth_tpu.evaluation.evaluator import (
    EvaluationConfig,
    EvaluationResult,
    ModelEvaluator,
)

__all__ = ["EvaluationConfig", "EvaluationResult", "ModelEvaluator"]

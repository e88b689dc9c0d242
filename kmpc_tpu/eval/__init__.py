"""Evaluation protocol: rollout modes, horizon metrics, plots."""

from kmpc_tpu.eval.evaluation import (
    EvaluationSettings,
    compute_horizon_mse,
    cumulative_mse_curve,
    evaluate_model,
)

__all__ = [
    "EvaluationSettings",
    "compute_horizon_mse",
    "cumulative_mse_curve",
    "evaluate_model",
]

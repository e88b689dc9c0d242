"""Evaluation protocol tests: rollout modes, NaN masking, horizon metrics,
best-periodic selection, metrics.json artifact."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmpc_tpu.config import get_config
from kmpc_tpu.data.systems import make_system
from kmpc_tpu.eval.evaluation import (
    EvaluationSettings,
    compute_horizon_mse,
    cumulative_mse_curve,
    evaluate_model,
)
from kmpc_tpu.models import make_model
from kmpc_tpu.ops.rollout import (
    rollout,
    rollout_every_step_reencode,
    rollout_no_reencode,
    rollout_periodic_reencode,
)


def _model_and_params(obs=2, z=8):
    cfg = get_config("generic")
    cfg.MODEL.TARGET_SIZE = z
    cfg.MODEL.ENCODER.LAYERS = [16]
    model = make_model(cfg, obs)
    return model, model.init(jax.random.PRNGKey(0)), cfg


# ---------------------------------------------------------------------------
# Rollout modes
# ---------------------------------------------------------------------------


def test_rollout_mode_shapes():
    model, params, _ = _model_and_params()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    for fn in (rollout_no_reencode, rollout_every_step_reencode):
        out = fn(model, params, x0, 7)
        assert out.shape == (7, 5, 2)
    out = rollout_periodic_reencode(model, params, x0, 7, period=3)
    assert out.shape == (7, 5, 2)


def test_rollout_period_validation():
    model, params, _ = _model_and_params()
    x0 = jnp.zeros((2, 2))
    with pytest.raises(ValueError):
        rollout_periodic_reencode(model, params, x0, 5, period=0)


def test_periodic_period1_equals_every_step():
    model, params, _ = _model_and_params()
    x0 = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    a = rollout_periodic_reencode(model, params, x0, 10, period=1)
    b = rollout_every_step_reencode(model, params, x0, 10)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_rollout_semantics_match_manual_loop():
    """Scan rollout equals an explicit encode/step/decode Python loop."""
    model, params, _ = _model_and_params()
    x0 = jax.random.normal(jax.random.PRNGKey(3), (3, 2))
    horizon, period = 9, 4
    out = np.asarray(rollout(model, params, x0, horizon, period))

    latent = model.encode(params, x0)
    expected = []
    for step in range(horizon):
        latent = model.step_latent(params, latent)
        x_pred = model.decode(params, latent)
        expected.append(np.asarray(x_pred))
        if (step + 1) % period == 0:
            latent = model.encode(params, x_pred)
    assert np.allclose(out, np.stack(expected), atol=1e-5)


def test_rollout_explosion_nan_masking():
    """Exploding trajectories emit NaN per-sample; healthy ones continue."""
    model, params, _ = _model_and_params()
    # Blow up the Koopman matrix so rollouts diverge fast.
    params = dict(params, kmat=params["kmat"] * 1e30)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (3, 2))
    out = np.asarray(rollout(model, params, x0, 6, 0))
    # After overflow to inf, outputs become NaN and stay NaN.
    assert np.isnan(out[-1]).all()


# ---------------------------------------------------------------------------
# Metric helpers
# ---------------------------------------------------------------------------


def test_compute_horizon_mse_nan_masking():
    sq = np.array(
        [[1.0, 4.0, np.nan],
         [3.0, 8.0, np.nan]]
    )  # [time=2, batch=3]; third IC exploded
    mean, std, per_ic, num_valid = compute_horizon_mse(sq, horizon=2)
    assert num_valid == 2
    assert np.isclose(mean, np.mean([2.0, 6.0]))
    assert len(per_ic) == 2


def test_compute_horizon_mse_all_nan():
    sq = np.full((3, 2), np.nan)
    mean, std, per_ic, num_valid = compute_horizon_mse(sq, 3)
    assert num_valid == 0
    assert np.isnan(mean)


def test_cumulative_mse_curve():
    sq = np.array([[1.0], [3.0], [5.0]])
    curve = cumulative_mse_curve(sq)
    assert np.allclose(curve, [1.0, 2.0, 3.0])


# ---------------------------------------------------------------------------
# evaluate_model end-to-end
# ---------------------------------------------------------------------------


def test_evaluate_model_end_to_end(tmp_path):
    model, params, cfg = _model_and_params()
    settings = EvaluationSettings(
        systems=("duffing",),
        horizons=(10, 30),
        periodic_reencode_periods=(5, 10),
        batch_size=8,
        phase_portrait_samples=4,
        phase_portrait_length=20,
        phase_portrait_reencode_periods=(0, 1),
    )
    results = evaluate_model(
        model, params, cfg, settings, output_dir=tmp_path, verbose=False
    )
    assert "duffing" in results
    modes = results["duffing"]["modes"]
    assert set(modes.keys()) == {"no_reencode", "every_step", "periodic_5", "periodic_10"}
    for mode in modes.values():
        assert "10" in mode["horizons"] and "30" in mode["horizons"]
        assert len(mode["mse_curve"]) == 30
    # Best periodic selected per horizon
    assert set(results["duffing"]["best_periodic"].keys()) <= {"10", "30"}
    # Artifacts written
    assert (tmp_path / "metrics.json").exists()
    with open(tmp_path / "metrics.json") as f:
        saved = json.load(f)
    assert "duffing" in saved
    assert (tmp_path / "duffing" / "mse_vs_horizon.png").exists()
    assert (tmp_path / "duffing" / "phase_portrait_plot_eval.png").exists()
    # Single-mode portraits (reference: evaluation.py:282-345): one per mode.
    for mode in ("no_reencode", "every_step", "periodic_5", "periodic_10"):
        assert (tmp_path / "duffing" / f"phase_portrait_{mode}.png").exists()


def test_evaluate_model_skips_incompatible_system():
    model, params, cfg = _model_and_params(obs=2)
    settings = EvaluationSettings(
        systems=("lorenz63",), horizons=(5,), periodic_reencode_periods=(2,),
        batch_size=4,
    )
    results = evaluate_model(model, params, cfg, settings, verbose=False)
    assert "lorenz63" not in results  # obs_size 3 != model 2


def test_evaluate_model_lyapunov_plots(tmp_path):
    model, params, cfg = _model_and_params()
    settings = EvaluationSettings(
        systems=("lyapunov",), horizons=(10,), periodic_reencode_periods=(5,),
        batch_size=4, phase_portrait_samples=3, phase_portrait_length=10,
        phase_portrait_reencode_periods=(1,),
    )
    results = evaluate_model(
        model, params, cfg, settings, output_dir=tmp_path, verbose=False
    )
    files = results["lyapunov"]["files"]
    assert "phase_portrait_comparison" in files
    assert "magnitude_histogram" in files
    # Reference artifact set (evaluation.py:520-724): Voronoi comparison
    # panels plus per-panel vector-magnitude histograms and basins.
    assert "phase_portrait_vector_hist_true" in files
    assert "phase_portrait_vector_hist_learned" in files
    assert "basin_assignment" in files
    from pathlib import Path as _P

    for key in ("phase_portrait_comparison", "phase_portrait_vector_hist_true",
                "phase_portrait_vector_hist_learned", "basin_assignment"):
        assert _P(files[key]).exists(), key

"""CLI + sweep + finance-plot tests: drive the user-facing scripts
end-to-end on tiny workloads (the reference has no CLI tests; these cover
C21-C24 of SURVEY.md §2)."""

import json
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess CLIs / long solves: run with --runslow

REPO = Path(__file__).resolve().parent.parent


def _run(args, timeout=600):
    env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    import os

    full_env = dict(os.environ)
    full_env.update(env)
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, capture_output=True, text=True,
        timeout=timeout, env=full_env,
    )


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """A tiny completed training run shared by the CLI tests."""
    log_dir = tmp_path_factory.mktemp("runs")
    res = _run([
        "train.py", "--cpu", "--config", "generic", "--env", "duffing",
        "--num_steps", "6", "--batch_size", "8", "--target_size", "8",
        "--no_final_eval", "--log_dir", str(log_dir),
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    runs = sorted(log_dir.glob("*/"))
    assert runs, res.stdout
    return runs[-1]


def test_train_cli(trained_run):
    assert (trained_run / "config.json").exists()
    assert (trained_run / "last" / "arrays.npz").exists()
    assert (trained_run / "metrics_history.jsonl").exists()


def test_plot_training_metrics_cli(trained_run):
    res = _run([
        "plot_training_metrics.py", "--log_dir", str(trained_run), "--summary",
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    assert (trained_run / "training_metrics.png").exists()
    assert "train/loss" in res.stdout


def test_evaluate_checkpoints_cli(trained_run):
    res = _run([
        "evaluate_checkpoints.py", "--cpu", "--run_dir", str(trained_run),
        "--horizons", "10", "--batch_size", "8", "--checkpoints", "last",
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    results_file = trained_run / "evaluation_results_last.json"
    assert results_file.exists()
    with open(results_file) as f:
        results = json.load(f)
    assert "duffing" in results
    assert (trained_run / "evaluation_summary.json").exists()


def test_sweep_sparsity_vmapped(tmp_path):
    """The vmapped sweep trains several coefficients at once."""
    from kmpc_tpu.config import get_config
    from kmpc_tpu.train.sweep import run_sparsity_sweep

    cfg = get_config("generic_sparse")
    cfg.ENV.ENV_NAME = "duffing"
    cfg.MODEL.TARGET_SIZE = 8
    cfg.MODEL.ENCODER.LAYERS = [16]
    cfg.TRAIN.NUM_STEPS = 5
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.LOG_INTERVAL = 2

    coeffs = [0.0, 0.01, 0.5]
    results, run_dir = run_sparsity_sweep(
        cfg, coeffs, log_dir=str(tmp_path), eval_horizon=10, eval_batch=8,
        verbose=False,
    )
    assert results["coefficients"] == coeffs
    assert len(results["no_reencode_mse"]) == 3
    assert all(np.isfinite(results["no_reencode_mse"]))
    assert (run_dir / "sparsity_sweep_results.json").exists()
    assert (run_dir / "sparsity_sweep.png").exists()


def test_sweep_coefficients_actually_differ(tmp_path):
    """Different coefficients must produce different trained params."""
    from kmpc_tpu.config import get_config
    from kmpc_tpu.data.systems import make_system, system_dt
    from kmpc_tpu.models import make_model
    from kmpc_tpu.train.sweep import make_sweep_train_step, stack_states
    import jax.numpy as jnp

    cfg = get_config("generic_sparse")
    cfg.ENV.ENV_NAME = "duffing"
    cfg.MODEL.TARGET_SIZE = 8
    cfg.MODEL.ENCODER.LAYERS = [16]
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.LR = 1e-2
    cfg.TRAIN.USE_SEQUENCE_LOSS = True

    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    states = stack_states(cfg, model, jax.random.PRNGKey(0), 2)
    step_fn = make_sweep_train_step(cfg, model, system_dt(cfg))
    coeffs = jnp.asarray([0.0, 1.0])
    for i in range(5):
        batch = system.sequence_batch(
            jax.random.fold_in(jax.random.PRNGKey(1), i), 8,
            cfg.TRAIN.SEQUENCE_LENGTH,
        )
        states, metrics = step_fn(states, batch, coeffs)
    w0 = np.asarray(states["params"]["encoder"][0]["w"][0])
    w1 = np.asarray(states["params"]["encoder"][0]["w"][1])
    assert not np.allclose(w0, w1)


def test_finance_plots(tmp_path):
    from kmpc_tpu.config import get_config, FinanceConfig
    from kmpc_tpu.data.finance import load_finance_data
    from kmpc_tpu.eval.finance_plots import save_finance_plots
    from kmpc_tpu.models import make_model
    from kmpc_tpu.train.loop import evaluate_finance

    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = 8
    cfg.MODEL.ENCODER.LAYERS = [16]
    cfg.ENV.FINANCE = FinanceConfig(
        TICKERS=["T1", "T2", "T3"], START_DATE="2018-01-01",
        END_DATE="2021-12-31", TRAIN_END="2019-12-31", VAL_END="2020-12-31",
        EMBEDDING_DIM=3, CACHE_DIR=None, SYNTHETIC=True,
    )
    fd = load_finance_data(cfg)
    model = make_model(cfg, fd.observation_size)
    params = model.init(jax.random.PRNGKey(0))
    init, future = fd.get_test_sequences(num_sequences=6, max_length=15)
    res = evaluate_finance(model, params, init, future, max_horizon=10,
                           periodic_reencode_periods=[5])
    files = save_finance_plots(res, fd, tmp_path)
    assert set(files.keys()) == {
        "forecast_mse_vs_horizon", "predicted_vs_actual_returns",
        "prediction_correlation", "mode_mse_comparison",
    }
    for path in files.values():
        assert Path(path).exists()



def test_sweep_sparsity_cli(tmp_path):
    res = _run([
        "sweep_sparsity.py", "--cpu", "--num_steps", "4", "--batch_size", "8",
        "--coefficients", "0.0", "0.1", "--eval_horizon", "8",
        "--log_dir", str(tmp_path),
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    runs = sorted(tmp_path.glob("*/"))
    assert runs
    assert (runs[-1] / "sparsity_sweep_results.json").exists()
    assert "Best coefficient" in res.stdout


def test_evaluate_checkpoints_cli_torch_ckpt(tmp_path):
    """A reference-format run dir (only checkpoint.pt, no config.json)
    drives the evaluation CLI via the torch importer."""
    torch = pytest.importorskip("torch")

    from kmpc_tpu.config import get_config
    from kmpc_tpu.models import make_model
    from kmpc_tpu.utils.torch_import import export_params_to_state_dict

    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = 16
    cfg.MODEL.ENCODER.LAYERS = [16]
    cfg.MODEL.DECODER.LAYERS = [16]
    cfg.ENV.FINANCE.EMBEDDING_DIM = 2
    obs = len(cfg.ENV.FINANCE.TICKERS) * cfg.ENV.FINANCE.EMBEDDING_DIM
    model = make_model(cfg, obs)
    params = model.init(jax.random.PRNGKey(0))
    sd = {
        k: torch.as_tensor(np.array(v))
        for k, v in export_params_to_state_dict(
            params, cfg.MODEL.MODEL_NAME
        ).items()
    }
    torch.save(
        {"step": 3, "model_state_dict": sd, "optimizer_state_dict": {},
         "config": cfg.to_dict(), "metrics": {}, "finance_metadata": {}},
        tmp_path / "checkpoint.pt",
    )

    res = _run([
        "evaluate_checkpoints.py", "--cpu", "--run_dir", str(tmp_path),
        "--horizons", "8", "--batch_size", "6", "--checkpoints", "checkpoint",
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    assert (tmp_path / "evaluation_results_checkpoint.json").exists()
    with open(tmp_path / "evaluation_summary.json") as f:
        assert json.load(f)["checkpoint"]["step"] == 3


def test_run_experiment_cli(tmp_path):
    """Synthesize a tiny finance run dir and drive the full-experiment
    CLI end-to-end (reference: run_experiment.py:33-171; previously
    untested as a subprocess — the DMD --parallel regression slipped
    through this gap)."""
    from kmpc_tpu.config import get_config
    from kmpc_tpu.data.finance import load_finance_data
    from kmpc_tpu.models import make_model
    from kmpc_tpu.train.loop import init_train_state
    from kmpc_tpu.utils.checkpoint import save_checkpoint

    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = 16
    cfg.MODEL.ENCODER.LAYERS = [16]
    cfg.MODEL.DECODER.LAYERS = [16]
    cfg.ENV.FINANCE.EMBEDDING_DIM = 2
    cfg.MPC.SOLVER.MAX_ITERS = 50
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    cfg.to_json(str(run_dir / "config.json"))
    fd = load_finance_data(cfg)
    model = make_model(cfg, fd.observation_size)
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))
    save_checkpoint(run_dir / "checkpoint", state, step=5,
                    config_dict=cfg.to_dict())

    res = _run([
        "run_experiment.py", "--cpu", "--path", str(run_dir),
        "--parallel", "--sweeps", "3", "--mpc_iters", "50",
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    assert (run_dir / "full_comparison_metrics.csv").exists()
    assert (run_dir / "equity_curves.png").exists()
    assert (run_dir / "experiment_results.json").exists()
    with open(run_dir / "experiment_results.json") as f:
        results = json.load(f)
    assert set(results) == {"BuyAndHold", "Markowitz", "DMD", "KoopmanMPC"}


def test_run_experiment_cli_rejects_non_finance_run(trained_run):
    res = _run(["run_experiment.py", "--cpu", "--path", str(trained_run)])
    assert res.returncode != 0
    assert "finance" in (res.stderr + res.stdout)


def test_sweep_fused_dispatch_bit_parity(tmp_path):
    """STEPS_PER_DISPATCH fusing must not change sweep numerics: the
    per-step batch keys are fold_in(data_key, step) in both modes."""
    from kmpc_tpu.config import get_config
    from kmpc_tpu.train.sweep import run_sparsity_sweep

    def run(spd, sub):
        cfg = get_config("generic_sparse")
        cfg.ENV.ENV_NAME = "duffing"
        cfg.MODEL.TARGET_SIZE = 8
        cfg.MODEL.ENCODER.LAYERS = [16]
        cfg.MODEL.DECODER.LAYERS = [16]
        cfg.TRAIN.NUM_STEPS = 6
        cfg.TRAIN.BATCH_SIZE = 8
        cfg.TRAIN.STEPS_PER_DISPATCH = spd
        results, _ = run_sparsity_sweep(
            cfg, [0.0, 0.05], log_dir=str(tmp_path / sub),
            eval_horizon=5, eval_batch=4, verbose=False,
        )
        return results

    a = run(1, "a")
    b = run(3, "b")
    np.testing.assert_array_equal(a["no_reencode_mse"], b["no_reencode_mse"])
    np.testing.assert_array_equal(a["sparsity_ratio"], b["sparsity_ratio"])

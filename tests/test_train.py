"""Training tests (mirrors reference tests/test_train.py coverage:
train_step updates params + metrics, evaluate shapes, short end-to-end
train() runs writing config.json + checkpoints, optimizer kmat LR group,
resume-from-checkpoint step count, all-environments smoke, loss sanity).
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmpc_tpu.config import Config, FinanceConfig, get_config
from kmpc_tpu.data.finance import load_finance_data
from kmpc_tpu.data.systems import make_system
from kmpc_tpu.models import make_model
from kmpc_tpu.train.loop import (
    _dispatch_chunks,
    build_optimizer,
    evaluate_finance,
    evaluate_system,
    init_train_state,
    make_fused_finance_train_steps,
    make_fused_system_train_steps,
    make_system_train_step,
    make_train_step,
    train,
    train_finance,
)
from kmpc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _tiny_cfg(env="duffing", seq=False):
    cfg = get_config("generic")
    cfg.ENV.ENV_NAME = env
    cfg.MODEL.TARGET_SIZE = 8
    cfg.MODEL.ENCODER.LAYERS = [16]
    cfg.TRAIN.NUM_STEPS = 6
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.USE_SEQUENCE_LOSS = seq
    cfg.TRAIN.SEQUENCE_LENGTH = 4
    cfg.TRAIN.EVAL_INTERVAL = 5
    cfg.TRAIN.LOG_INTERVAL = 2
    return cfg


def _tiny_finance_cfg():
    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = 16
    cfg.MODEL.ENCODER.LAYERS = [32]
    cfg.TRAIN.NUM_STEPS = 6
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.EVAL_INTERVAL = 5
    cfg.TRAIN.LOG_INTERVAL = 2
    cfg.ENV.FINANCE = FinanceConfig(
        TICKERS=["T1", "T2", "T3"],
        START_DATE="2018-01-01",
        END_DATE="2021-12-31",
        TRAIN_END="2019-12-31",
        VAL_END="2020-12-31",
        EMBEDDING_DIM=3,
        CACHE_DIR=None,
        SYNTHETIC=True,
    )
    return cfg


# ---------------------------------------------------------------------------
# train_step
# ---------------------------------------------------------------------------


def test_train_step_updates_params_and_metrics():
    cfg = _tiny_cfg()
    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))
    before = np.asarray(state["params"]["kmat"]).copy()
    enc_before = np.asarray(state["params"]["encoder"][0]["w"]).copy()

    step_fn = make_train_step(cfg, model, dt=system.dt)
    x = system.reset(jax.random.PRNGKey(1), 8)
    nx = system.step(x)
    state, metrics = step_fn(state, (x, nx))

    assert int(state["step"]) == 1
    assert not np.allclose(np.asarray(state["params"]["encoder"][0]["w"]), enc_before)
    for k in ["loss", "residual_loss", "reconst_loss", "prediction_loss", "sparsity_loss"]:
        assert np.isfinite(float(metrics[k]))


def test_sequence_train_step():
    cfg = _tiny_cfg(seq=True)
    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, model, dt=system.dt)
    seq = system.sequence_batch(jax.random.PRNGKey(1), 8, cfg.TRAIN.SEQUENCE_LENGTH)
    state, metrics = step_fn(state, seq)
    assert np.isfinite(float(metrics["loss"]))


def test_fused_system_train_step_runs_and_learns():
    cfg = _tiny_cfg(seq=True)
    cfg.TRAIN.LR = 3e-3
    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = make_system_train_step(cfg, model, system)

    # Fixed evaluation batch: loss must drop after training.
    eval_seq = system.sequence_batch(jax.random.PRNGKey(77), 16, cfg.TRAIN.SEQUENCE_LENGTH)
    loss_before = float(model.loss_sequence(state["params"], eval_seq)[0])
    for i in range(40):
        state, metrics = step_fn(state, jax.random.fold_in(jax.random.PRNGKey(2), i))
        assert np.isfinite(float(metrics["loss"]))
    loss_after = float(model.loss_sequence(state["params"], eval_seq)[0])
    assert loss_after < loss_before


def test_fused_multi_step_matches_sequential_system():
    """make_fused_system_train_steps(K) must reproduce K separate
    dispatches exactly (same fold_in key stream)."""
    cfg = _tiny_cfg(seq=True)
    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    data_key = jax.random.PRNGKey(3)

    state_a = init_train_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = make_system_train_step(cfg, model, system)
    for s in range(5):
        state_a, m_a = step_fn(state_a, jax.random.fold_in(data_key, s))

    state_b = init_train_state(cfg, model, jax.random.PRNGKey(0))
    fused = make_fused_system_train_steps(cfg, model, system, 5)
    state_b, m_b = fused(state_b, data_key, 0, )

    for la, lb in zip(jax.tree.leaves(state_a["params"]),
                      jax.tree.leaves(state_b["params"])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)
    # Returned metrics are the LAST inner step's.
    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), atol=1e-6)
    assert int(state_b["step"]) == 5


def test_fused_multi_step_matches_sequential_finance():
    cfg = _tiny_finance_cfg()
    fd = load_finance_data(cfg)
    model = make_model(cfg, fd.observation_size)
    data_key = jax.random.PRNGKey(4)
    L = cfg.TRAIN.SEQUENCE_LENGTH if cfg.TRAIN.USE_SEQUENCE_LOSS else 1

    state_a = init_train_state(cfg, model, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, model, dt=1.0)
    for s in range(4):
        win = fd.sample_batch(jax.random.fold_in(data_key, s), "train",
                              cfg.TRAIN.BATCH_SIZE, L)
        batch = win if cfg.TRAIN.USE_SEQUENCE_LOSS else (win[:, 0], win[:, 1])
        state_a, m_a = step_fn(state_a, batch)

    state_b = init_train_state(cfg, model, jax.random.PRNGKey(0))
    fused = make_fused_finance_train_steps(cfg, model, 4)
    state_b, m_b = fused(state_b, data_key, 0, fd.train)

    for la, lb in zip(jax.tree.leaves(state_a["params"]),
                      jax.tree.leaves(state_b["params"])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)
    assert np.isclose(float(m_a["loss"]), float(m_b["loss"]), atol=1e-6)


def test_dispatch_chunks_hit_boundaries():
    """Every log/eval-boundary step must end a chunk, chunks cover
    [start, num_steps) exactly, and no chunk exceeds spd."""
    for (start, num, spd, ivals) in [
        (0, 23, 5, (4, 10)),
        (0, 100, 50, (100, 500)),
        (7, 61, 8, (10, 25)),
        (0, 6, 1, (2, 5)),
    ]:
        chunks = list(_dispatch_chunks(start, num, spd, ivals))
        steps = []
        for s0, c in chunks:
            assert 1 <= c <= spd
            steps.extend(range(s0, s0 + c))
        assert steps == list(range(start, num))
        ends = {s0 + c - 1 for s0, c in chunks}
        for s in range(start, num):
            if any(s % k == 0 for k in ivals) or s == num - 1:
                assert s in ends, (s, chunks)


@pytest.mark.slow
def test_train_finance_fused_dispatch_end_to_end(tmp_path):
    """train_finance with STEPS_PER_DISPATCH>1 produces the same final
    params as the per-step path (identical RNG stream)."""
    cfg = _tiny_finance_cfg()
    cfg.TRAIN.NUM_STEPS = 7
    state_a, _, _ = train_finance(cfg, log_dir=str(tmp_path / "a"), verbose=False)
    cfg2 = _tiny_finance_cfg()
    cfg2.TRAIN.NUM_STEPS = 7
    cfg2.TRAIN.STEPS_PER_DISPATCH = 3
    state_b, _, _ = train_finance(cfg2, log_dir=str(tmp_path / "b"), verbose=False)
    for la, lb in zip(jax.tree.leaves(state_a["params"]),
                      jax.tree.leaves(state_b["params"])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


# ---------------------------------------------------------------------------
# Optimizer (kmat LR group)
# ---------------------------------------------------------------------------


def test_optimizer_kmat_lr_group():
    """kmat updates with K_MATRIX_LR: equal unit grads should move kmat
    ~LR_k and encoder ~LR after one Adam step (Adam normalizes magnitude,
    so the first-step update equals the LR up to eps)."""
    cfg = _tiny_cfg()
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.K_MATRIX_LR = 1e-5
    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    params = model.init(jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    kmat_mag = float(jnp.max(jnp.abs(updates["kmat"])))
    enc_mag = float(jnp.max(jnp.abs(updates["encoder"][0]["w"])))
    assert kmat_mag == pytest.approx(1e-5, rel=0.1)
    assert enc_mag == pytest.approx(1e-3, rel=0.1)


# ---------------------------------------------------------------------------
# Evaluation helpers
# ---------------------------------------------------------------------------


def test_evaluate_system_shapes():
    cfg = _tiny_cfg()
    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    params = model.init(jax.random.PRNGKey(0))
    x0 = system.reset(jax.random.PRNGKey(1), 4)
    res = evaluate_system(model, params, system, x0, num_steps=20)
    assert res["true_trajectory"].shape == (20, 4, 2)
    assert res["pred_trajectory"].shape == (20, 4, 2)
    assert res["pred_error"].shape == (20,)
    assert np.isfinite(res["mean_error"])


def test_evaluate_finance_modes():
    cfg = _tiny_finance_cfg()
    fd = load_finance_data(cfg)
    model = make_model(cfg, fd.observation_size)
    params = model.init(jax.random.PRNGKey(0))
    init, future = fd.get_test_sequences(num_sequences=8, max_length=20)
    res = evaluate_finance(model, params, init, future, max_horizon=15,
                           periodic_reencode_periods=[5])
    assert set(res["mean_mses"].keys()) == {"every_step", "no_reencode", "periodic_5"}
    assert res["mse_reencode"].shape == (15,)
    assert res["best_mode"] in res["mean_mses"]


# ---------------------------------------------------------------------------
# End-to-end train() runs
# ---------------------------------------------------------------------------


def test_train_system_end_to_end(tmp_path):
    cfg = _tiny_cfg(seq=True)
    state, model, run_dir = train(cfg, log_dir=str(tmp_path), verbose=False)
    assert (run_dir / "config.json").exists()
    assert (run_dir / "last" / "arrays.npz").exists()
    assert (run_dir / "metrics_history.jsonl").exists()
    assert (run_dir / "metrics_summary.json").exists()
    assert int(state["step"]) == cfg.TRAIN.NUM_STEPS


def test_train_finance_end_to_end(tmp_path):
    cfg = _tiny_finance_cfg()
    state, model, run_dir = train_finance(cfg, log_dir=str(tmp_path), verbose=False)
    assert (run_dir / "config.json").exists()
    assert (run_dir / "evaluation_results.json").exists()
    with open(run_dir / "evaluation_results.json") as f:
        summary = json.load(f)
    assert "mean_mse_no_reencode" in summary
    assert (run_dir / "last" / "arrays.npz").exists()


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path):
    cfg = _tiny_cfg(seq=True)
    state, model, run_dir = train(cfg, log_dir=str(tmp_path), verbose=False)
    cfg2 = _tiny_cfg(seq=True)
    cfg2.TRAIN.NUM_STEPS = 10
    state2, _, run_dir2 = train(
        cfg2, log_dir=str(tmp_path / "resumed"),
        checkpoint_path=str(run_dir / "last"), verbose=False,
    )
    # Resumed from step 5 (last eval save at EVAL_INTERVAL=5) to 10.
    assert int(state2["step"]) == 10


@pytest.mark.parametrize("env", ["pendulum", "lotka_volterra", "parabolic", "lyapunov", "lorenz63"])
def test_all_environments_smoke(env, tmp_path):
    cfg = _tiny_cfg(env=env)
    cfg.TRAIN.NUM_STEPS = 3
    cfg.TRAIN.EVAL_INTERVAL = 2
    state, model, run_dir = train(cfg, log_dir=str(tmp_path), verbose=False)
    assert int(state["step"]) == 3


# ---------------------------------------------------------------------------
# Checkpoint round-trip
# ---------------------------------------------------------------------------


def test_checkpoint_round_trip(tmp_path):
    cfg = _tiny_cfg()
    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "ck", state, step=42, config_dict=cfg.to_dict(),
                    extra={"note": "hi"})
    loaded, meta = load_checkpoint(tmp_path / "ck", state)
    assert meta["step"] == 42
    assert meta["extra"]["note"] == "hi"
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(state)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    cfg = _tiny_cfg()
    system = make_system(cfg)
    model = make_model(cfg, system.observation_size)
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "ck", state, step=0)
    cfg2 = _tiny_cfg()
    cfg2.MODEL.TARGET_SIZE = 12  # different shape
    model2 = make_model(cfg2, system.observation_size)
    state2 = init_train_state(cfg2, model2, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        load_checkpoint(tmp_path / "ck", state2)



def test_listakm_training_smoke(tmp_path):
    """LISTAKM (lista preset, scaled down) trains end-to-end."""
    cfg = get_config("lista")
    cfg.ENV.ENV_NAME = "duffing"
    cfg.MODEL.TARGET_SIZE = 32
    cfg.MODEL.ENCODER.LISTA.NUM_LOOPS = 3
    cfg.MODEL.ENCODER.LISTA.L = 1.0
    cfg.MODEL.ENCODER.LISTA.ALPHA = 0.01
    cfg.TRAIN.NUM_STEPS = 4
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.EVAL_INTERVAL = 3
    cfg.TRAIN.USE_SEQUENCE_LOSS = True
    cfg.TRAIN.SEQUENCE_LENGTH = 4
    state, model, run_dir = train(cfg, log_dir=str(tmp_path), verbose=False)
    assert int(state["step"]) == 4
    assert "lista" in state["params"] and "dict" in state["params"]

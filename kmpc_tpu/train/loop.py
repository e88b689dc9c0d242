"""Training loops: jitted steps, optimizer with per-param LR, eval, checkpoints.

TPU-native rebuild of the reference training pipeline
(reference: train.py:118-1029). Divergences, on purpose:

- One compiled program per training step. For dynamical systems the data
  generation (reset + RK4 scan) is FUSED into the jitted train step, so
  batch synthesis happens on-device instead of a per-env Python loop on
  the host (reference: train.py:855-866, data.py:102-123).
- Finance batches are on-device random-window gathers (sampling with
  replacement) instead of a shuffled epoch DataLoader
  (reference: train.py:406-421) — statistically equivalent for SGD and
  compatible with a fixed compiled step.
- Optimizer is optax AdamW with a label-partitioned second group for the
  Koopman matrix: lr=K_MATRIX_LR, weight_decay=0 (reference:
  train.py:158-188).
- The Koopman-spectrum metric is logged at LOG_INTERVAL from the host
  instead of every step (reference does a CPU eigvals sync per step,
  model.py:663-669).
- Checkpoints are pytree npz directories (utils/checkpoint.py) instead
  of torch.save dicts (reference: train.py:475-492).
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kmpc_tpu.config import Config
from kmpc_tpu.data.finance import FinanceData, load_finance_data
from kmpc_tpu.data.systems import DynamicalSystem, make_system, system_dt
from kmpc_tpu.models.koopman import KoopmanModel, make_model, spectral_metrics
from kmpc_tpu.ops.rollout import rollout
from kmpc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from kmpc_tpu.utils.logger import MetricsLogger


def _maybe_shard(cfg: Config, model: KoopmanModel, state: Dict):
    """Apply cfg.PARALLEL mesh sharding to the train state.

    Returns (state, mesh_or_None, batch_shard_fn). With a trivial 1x1x1
    PARALLEL section this is a no-op; otherwise params get the tensor-
    parallel placement and batches are sharded over (data, scenario).
    """
    sizes = (cfg.PARALLEL.DATA, cfg.PARALLEL.SCENARIO, cfg.PARALLEL.MODEL)
    if all(s in (1, None) for s in sizes):
        return state, None, lambda b: b

    from kmpc_tpu.parallel.mesh import (
        mesh_from_config,
        shard_batch,
        shard_params,
    )

    mesh = mesh_from_config(cfg)
    state = dict(state, params=shard_params(state["params"], model, mesh))

    def shard(batch):
        return shard_batch(batch, mesh, ("data", "scenario"))

    return state, mesh, shard


# ---------------------------------------------------------------------------
# Optimizer (reference: train.py:158-188)
# ---------------------------------------------------------------------------


def build_optimizer(cfg: Config, params: Dict) -> optax.GradientTransformation:
    """AdamW with a separate LR group (no weight decay) for ``kmat``."""

    def label_fn(tree):
        return {k: ("kmat" if k == "kmat" else "other") for k in tree}

    return optax.multi_transform(
        {
            "other": optax.adamw(
                learning_rate=cfg.TRAIN.LR, weight_decay=cfg.TRAIN.WEIGHT_DECAY
            ),
            "kmat": optax.adamw(
                learning_rate=cfg.TRAIN.K_MATRIX_LR, weight_decay=0.0
            ),
        },
        label_fn,
    )


# ---------------------------------------------------------------------------
# Train state + steps
# ---------------------------------------------------------------------------


def init_train_state(cfg: Config, model: KoopmanModel, key: jax.Array) -> Dict[str, Any]:
    params = model.init(key)
    tx = build_optimizer(cfg, params)
    return {"params": params, "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}


def make_train_step(cfg: Config, model: KoopmanModel, dt: float):
    """Jitted (state, batch) -> (state, metrics) step.

    batch is either (x, nx) [pairwise] or x_seq [B, T+1, obs] [sequence],
    decided statically by cfg.TRAIN.USE_SEQUENCE_LOSS
    (reference: train.py:118-155).
    """
    tx = build_optimizer(cfg, None)
    use_seq = cfg.TRAIN.USE_SEQUENCE_LOSS

    def loss_fn(params, batch):
        if use_seq:
            return model.loss_sequence(params, batch, dt)
        x, nx = batch
        return model.loss(params, x, nx)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            metrics,
        )

    return train_step


def make_system_train_step(cfg: Config, model: KoopmanModel, system: DynamicalSystem):
    """Fused data-generation + gradient step for dynamical systems.

    The whole pipeline — vmapped reset, RK4 lax.scan window, sequence or
    pairwise loss, AdamW update — is one jitted program taking only the
    PRNG key (replaces reference: train.py:849-866 + data.py:95-172).
    """
    tx = build_optimizer(cfg, None)
    use_seq = cfg.TRAIN.USE_SEQUENCE_LOSS
    dt = system.dt
    B = cfg.TRAIN.BATCH_SIZE
    T = cfg.TRAIN.SEQUENCE_LENGTH

    def loss_fn(params, key):
        if use_seq:
            seq = system.sequence_batch(key, B, T)
            return model.loss_sequence(params, seq, dt)
        x = system.reset(key, B)
        nx = system.step(x)
        return model.loss(params, x, nx)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], key
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            metrics,
        )

    return train_step


def make_fused_finance_train_steps(cfg: Config, model: KoopmanModel, num_inner: int):
    """ONE compiled program running ``num_inner`` optimizer steps.

    Each inner step re-derives its batch key as ``fold_in(data_key, s)``
    and samples windows on-device exactly like FinanceData.sample_batch,
    so the parameter trajectory is bit-identical to ``num_inner``
    separate dispatches — only the ~30 ms/dispatch relay latency is
    amortized. Training data is an ARGUMENT (device-resident, no copy),
    not a closure constant.

    Returns fused(state, data_key, start_step, train_data) ->
    (state, metrics-of-last-inner-step).
    """
    tx = build_optimizer(cfg, None)
    use_seq = cfg.TRAIN.USE_SEQUENCE_LOSS
    B = cfg.TRAIN.BATCH_SIZE
    L = cfg.TRAIN.SEQUENCE_LENGTH if use_seq else 1

    def loss_fn(params, batch):
        if use_seq:
            return model.loss_sequence(params, batch, 1.0)
        x, nx = batch
        return model.loss(params, x, nx)

    @partial(jax.jit, donate_argnums=(0,))
    def fused(state, data_key, start_step, train_data):
        n = train_data.shape[0] - L

        def body(st, s):
            bkey = jax.random.fold_in(data_key, s)
            starts = jax.random.randint(bkey, (B,), 0, n)
            idx = starts[:, None] + jnp.arange(L + 1)[None, :]
            win = train_data[idx]
            batch = win if use_seq else (win[:, 0], win[:, 1])
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st["params"], batch
            )
            updates, opt_state = tx.update(grads, st["opt_state"], st["params"])
            params = optax.apply_updates(st["params"], updates)
            return (
                {"params": params, "opt_state": opt_state, "step": st["step"] + 1},
                metrics,
            )

        state, ms = jax.lax.scan(body, state, start_step + jnp.arange(num_inner))
        return state, jax.tree.map(lambda x: x[-1], ms)

    return fused


def make_fused_system_train_steps(
    cfg: Config, model: KoopmanModel, system: DynamicalSystem, num_inner: int
):
    """Fused multi-step variant of make_system_train_step: data synthesis
    (vmapped reset + RK4 scan) AND ``num_inner`` optimizer steps in one
    program; per-step keys are fold_in(data_key, s), matching the
    unfused loop's stream exactly."""
    tx = build_optimizer(cfg, None)
    use_seq = cfg.TRAIN.USE_SEQUENCE_LOSS
    dt = system.dt
    B = cfg.TRAIN.BATCH_SIZE
    T = cfg.TRAIN.SEQUENCE_LENGTH

    def loss_fn(params, key):
        if use_seq:
            seq = system.sequence_batch(key, B, T)
            return model.loss_sequence(params, seq, dt)
        x = system.reset(key, B)
        nx = system.step(x)
        return model.loss(params, x, nx)

    @partial(jax.jit, donate_argnums=(0,))
    def fused(state, data_key, start_step):
        def body(st, s):
            skey = jax.random.fold_in(data_key, s)
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st["params"], skey
            )
            updates, opt_state = tx.update(grads, st["opt_state"], st["params"])
            params = optax.apply_updates(st["params"], updates)
            return (
                {"params": params, "opt_state": opt_state, "step": st["step"] + 1},
                metrics,
            )

        state, ms = jax.lax.scan(body, state, start_step + jnp.arange(num_inner))
        return state, jax.tree.map(lambda x: x[-1], ms)

    return fused


def _dispatch_chunks(start: int, num_steps: int, spd: int, intervals):
    """Yield (step, chunk) so that every step where the loop logs,
    evaluates, or checkpoints (multiples of the intervals, and the final
    step) lands exactly at a chunk END — the fused program returns the
    last inner step's metrics, so boundary steps keep their per-step
    metrics identical to the unfused loop."""
    last = num_steps - 1
    step = start
    while step < num_steps:
        nb = last
        for k in intervals:
            nb = min(nb, ((step + k - 1) // k) * k)
        chunk = min(spd, nb - step + 1, num_steps - step)
        yield step, chunk
        step += chunk


# ---------------------------------------------------------------------------
# Evaluation helpers (reference: train.py:191-300)
# ---------------------------------------------------------------------------


def evaluate_system(
    model: KoopmanModel,
    params: Dict,
    system: DynamicalSystem,
    x0: jax.Array,
    num_steps: int = 50,
) -> Dict[str, Any]:
    """Quick rollout-vs-truth eval used during training
    (reference: train.py:191-218)."""
    true_traj = system.trajectory(x0, num_steps)                 # [T, B, D]
    pred_traj = rollout(model, params, x0, num_steps, reencode_period=1)
    err = jnp.linalg.norm(pred_traj - true_traj, axis=-1)
    step_error = jnp.nanmean(err, axis=1)
    return {
        "true_trajectory": true_traj,
        "pred_trajectory": pred_traj,
        "pred_error": step_error,
        "mean_error": float(jnp.nanmean(step_error)),
        "final_error": float(step_error[-1]),
    }


def evaluate_finance(
    model: KoopmanModel,
    params: Dict,
    initial_states: jax.Array,
    future_states: jax.Array,
    max_horizon: int = 50,
    periodic_reencode_periods=(5, 10, 25),
) -> Dict[str, Any]:
    """Multi-mode finance rollout MSE (reference: train.py:221-300).

    Rollouts run through the jitted entry (one compiled program per
    mode/shape): op-by-op dispatch is prohibitively slow on high-latency
    remote-execution backends.
    """
    from kmpc_tpu.ops.rollout import rollout_jit

    horizon = min(max_horizon, future_states.shape[0])
    true = future_states[:horizon]

    modes = {"every_step": 1, "no_reencode": 0}
    for p in periodic_reencode_periods:
        modes[f"periodic_{p}"] = p

    mse_curves, l2_curves, predictions = {}, {}, {}
    for name, period in modes.items():
        pred = rollout_jit(model, params, initial_states, horizon, period)
        predictions[name] = pred
        mse_curves[name] = jnp.mean((pred - true) ** 2, axis=(1, 2))
        l2_curves[name] = jnp.mean(jnp.linalg.norm(pred - true, axis=-1), axis=1)

    mean_mses = {k: float(jnp.mean(v)) for k, v in mse_curves.items()}
    best_mode = min(mean_mses, key=mean_mses.get)

    return {
        "mse_reencode": np.asarray(mse_curves["every_step"]),
        "mse_no_reencode": np.asarray(mse_curves["no_reencode"]),
        "l2_reencode": np.asarray(l2_curves["every_step"]),
        "l2_no_reencode": np.asarray(l2_curves["no_reencode"]),
        "mean_mse_reencode": mean_mses["every_step"],
        "mean_mse_no_reencode": mean_mses["no_reencode"],
        "final_mse_reencode": float(mse_curves["every_step"][-1]),
        "final_mse_no_reencode": float(mse_curves["no_reencode"][-1]),
        "mse_curves": {k: np.asarray(v) for k, v in mse_curves.items()},
        "l2_curves": {k: np.asarray(v) for k, v in l2_curves.items()},
        "mean_mses": mean_mses,
        "predictions": {k: np.asarray(v) for k, v in predictions.items()},
        "true": np.asarray(true),
        "best_mode": best_mode,
        "best_mse": mean_mses[best_mode],
    }


@partial(jax.jit, static_argnums=(0,))
def _val_loss_batch(model, params, win):
    return model.loss_sequence(params, win)[0]


@partial(jax.jit, static_argnums=(0,))
def _val_loss_pair(model, params, x, nx):
    return model.loss(params, x, nx)[0]


def _val_loss(model, params, fd: FinanceData, cfg: Config, max_batches: int = 10) -> float:
    """Capped validation loss (reference: train.py:451-472); jitted per
    batch shape so the loop stays fast on remote backends.

    Splits shorter than one full batch fall back to a single smaller
    batch (one extra compilation) instead of silently reporting 0.0;
    splits shorter than the window return NaN.
    """
    use_seq = cfg.TRAIN.USE_SEQUENCE_LOSS
    L = cfg.TRAIN.SEQUENCE_LENGTH if use_seq else 1
    B = cfg.TRAIN.BATCH_SIZE
    n = fd.num_examples("val", L)
    if n <= 0:
        return float("nan")

    def one(start, size):
        idx = jnp.arange(start, start + size)
        win = fd.batch_at(idx, "val", L)
        if use_seq:
            return float(_val_loss_batch(model, params, win))
        return float(_val_loss_pair(model, params, win[:, 0], win[:, 1]))

    if n < B:
        return one(0, n)
    total, batches = 0.0, 0
    for start in range(0, n - B + 1, B):
        total += one(start, B)
        batches += 1
        if batches >= max_batches:
            break
    return total / max(batches, 1)


# ---------------------------------------------------------------------------
# Finance training (reference: train.py:303-571)
# ---------------------------------------------------------------------------


def train_finance(
    cfg: Config,
    log_dir: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    finance_data: Optional[FinanceData] = None,
    verbose: bool = True,
) -> Tuple[Dict, KoopmanModel, Path]:
    """Finance training loop. Returns (state, model, run_dir)."""
    if log_dir is None:
        log_dir = "./runs/kae_finance"
    run_dir = Path(log_dir) / datetime.now().strftime("%Y%m%d-%H%M%S")
    run_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(str(run_dir / "config.json"))
    logger = MetricsLogger(run_dir)

    fd = finance_data if finance_data is not None else load_finance_data(cfg)
    model = make_model(cfg, fd.observation_size)

    key = jax.random.PRNGKey(cfg.SEED)
    init_key, data_key = jax.random.split(key)
    state = init_train_state(cfg, model, init_key)

    start_step = 0
    if checkpoint_path is not None:
        if str(checkpoint_path).endswith(".pt"):
            # Reference torch checkpoint: params AND AdamW moments
            # (reference resume contract, train.py:378-384).
            from kmpc_tpu.utils.torch_import import (
                resume_train_state_from_torch,
            )

            state = resume_train_state_from_torch(checkpoint_path, cfg, state)
            start_step = int(state["step"])
        else:
            state, meta = load_checkpoint(checkpoint_path, state)
            start_step = int(meta["step"])
        if verbose:
            print(f"Resumed from checkpoint at step {start_step}")

    state, mesh, shard = _maybe_shard(cfg, model, state)
    if mesh is not None and verbose:
        print(f"SPMD mesh: {dict(mesh.shape)}")

    train_step = make_train_step(cfg, model, dt=1.0)
    use_seq = cfg.TRAIN.USE_SEQUENCE_LOSS
    L = cfg.TRAIN.SEQUENCE_LENGTH if use_seq else 1

    test_init, test_future = fd.get_test_sequences(
        num_sequences=min(100, fd.test.shape[0] // 2), max_length=100
    )

    if verbose:
        print(f"Training {cfg.MODEL.MODEL_NAME} on finance data")
        print(f"Observation size: {fd.observation_size} "
              f"({fd.n_assets} assets x {fd.embedding_dim} embedding)")
        print(f"Steps: {cfg.TRAIN.NUM_STEPS}  Batch: {cfg.TRAIN.BATCH_SIZE}")
        print(f"Run dir: {run_dir}")

    # Fused multi-step dispatch (no-op at STEPS_PER_DISPATCH=1; forced
    # off under a PARALLEL mesh, whose batches are sharded host-side).
    spd = max(1, int(cfg.TRAIN.STEPS_PER_DISPATCH))
    if mesh is not None:
        spd = 1
    fused_cache: Dict[int, Any] = {}

    def run_steps(state, step, chunk):
        if spd == 1 or chunk == 1:
            bkey = jax.random.fold_in(data_key, step)
            win = fd.sample_batch(bkey, "train", cfg.TRAIN.BATCH_SIZE, L)
            batch = shard(win) if use_seq else shard((win[:, 0], win[:, 1]))
            return train_step(state, batch)
        if chunk not in fused_cache:
            fused_cache[chunk] = make_fused_finance_train_steps(cfg, model, chunk)
        return fused_cache[chunk](state, data_key, step, fd.train)

    best_val = float("inf")
    t0 = time.time()
    intervals = (cfg.TRAIN.LOG_INTERVAL, cfg.TRAIN.EVAL_INTERVAL)
    for step0, chunk in _dispatch_chunks(start_step, cfg.TRAIN.NUM_STEPS, spd, intervals):
        state, metrics = run_steps(state, step0, chunk)
        step = step0 + chunk - 1  # metrics describe the chunk's last step

        if step % cfg.TRAIN.LOG_INTERVAL == 0:
            host = {k: float(v) for k, v in metrics.items()}
            host.update(spectral_metrics(state["params"]))
            logger.log_dict(host, step, prefix="train")
            if verbose:
                print(
                    f"Step {step}/{cfg.TRAIN.NUM_STEPS} | Loss: {host['loss']:.4f} | "
                    f"Res: {host['residual_loss']:.4f} | Recon: {host['reconst_loss']:.4f} | "
                    f"Pred: {host['prediction_loss']:.4f} | "
                    f"Sparsity: {host['sparsity_ratio']:.3f}"
                )

        if step % cfg.TRAIN.EVAL_INTERVAL == 0 or step == cfg.TRAIN.NUM_STEPS - 1:
            eval_results = evaluate_finance(
                model, state["params"], test_init, test_future, max_horizon=50
            )
            logger.log_scalar("eval/mean_mse_reencode", eval_results["mean_mse_reencode"], step)
            logger.log_scalar("eval/mean_mse_no_reencode", eval_results["mean_mse_no_reencode"], step)
            logger.log_scalar("eval/final_mse_reencode", eval_results["final_mse_reencode"], step)
            logger.log_scalar("eval/final_mse_no_reencode", eval_results["final_mse_no_reencode"], step)

            val_loss = _val_loss(model, state["params"], fd, cfg)
            logger.log_scalar("val/loss", val_loss, step)
            if verbose:
                print(f"  Eval | MSE (reencode): {eval_results['mean_mse_reencode']:.4f} | "
                      f"MSE (no reencode): {eval_results['mean_mse_no_reencode']:.4f} | "
                      f"Val: {val_loss:.4f}")

            done = int(state["step"])
            save_checkpoint(
                run_dir / "last", state, done, cfg.to_dict(),
                extra={"finance_metadata": fd.metadata},
            )
            if val_loss < best_val:
                best_val = val_loss
                save_checkpoint(
                    run_dir / "checkpoint", state, done, cfg.to_dict(),
                    extra={"finance_metadata": fd.metadata},
                )

    if verbose:
        steps_done = max(cfg.TRAIN.NUM_STEPS - start_step, 1)
        print(f"Training done in {time.time()-t0:.1f}s "
              f"({steps_done / max(time.time()-t0, 1e-9):.1f} steps/s)")

    # Final evaluation uses the best checkpoint when available
    # (reference: train.py:525-531).
    best_dir = run_dir / "checkpoint"
    eval_params = state["params"]
    if (best_dir / "arrays.npz").exists():
        best_state, _ = load_checkpoint(best_dir, state)
        eval_params = best_state["params"]

    final_eval = evaluate_finance(
        model, eval_params, test_init, test_future,
        max_horizon=100, periodic_reencode_periods=[5, 10, 25],
    )
    eval_summary = {
        "mean_mse_reencode": final_eval["mean_mse_reencode"],
        "mean_mse_no_reencode": final_eval["mean_mse_no_reencode"],
        "final_mse_reencode": final_eval["final_mse_reencode"],
        "final_mse_no_reencode": final_eval["final_mse_no_reencode"],
        "mse_reencode_curve": final_eval["mse_reencode"].tolist(),
        "mse_no_reencode_curve": final_eval["mse_no_reencode"].tolist(),
        "all_modes_mean_mse": final_eval["mean_mses"],
        "best_mode": final_eval["best_mode"],
        "best_mse": final_eval["best_mse"],
    }
    with open(run_dir / "evaluation_results.json", "w") as f:
        json.dump(eval_summary, f, indent=2)

    # Finance evaluation plots (best-effort, reference: train.py:558-564).
    try:
        from kmpc_tpu.eval.finance_plots import save_finance_plots

        save_finance_plots(final_eval, fd, run_dir)
    except Exception as e:  # pragma: no cover - plotting best-effort
        print(f"Warning: failed to generate finance plots: {e}")

    logger.close()
    _plot_training_curves(run_dir, verbose)
    return state, model, run_dir


# ---------------------------------------------------------------------------
# Dynamical-systems training (reference: train.py:752-1029)
# ---------------------------------------------------------------------------


def train_system(
    cfg: Config,
    log_dir: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    verbose: bool = True,
    final_eval: bool = False,
) -> Tuple[Dict, KoopmanModel, Path]:
    """Dynamical-systems training loop. Returns (state, model, run_dir).

    ``final_eval=True`` additionally runs the standardized evaluation
    suite on the last and best checkpoints after training (reference:
    train.py:944-1014); the CLI enables it, the library default keeps
    short programmatic runs fast.
    """
    if log_dir is None:
        log_dir = "./runs/kae"
    run_dir = Path(log_dir) / datetime.now().strftime("%Y%m%d-%H%M%S")
    run_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(str(run_dir / "config.json"))
    logger = MetricsLogger(run_dir)

    system = make_system(cfg)
    dt = system_dt(cfg)
    model = make_model(cfg, system.observation_size)

    key = jax.random.PRNGKey(cfg.SEED)
    init_key, data_key = jax.random.split(key)
    state = init_train_state(cfg, model, init_key)

    start_step = 0
    if checkpoint_path is not None:
        if str(checkpoint_path).endswith(".pt"):
            # Reference torch checkpoint: params AND AdamW moments
            # (reference resume contract, train.py:378-384).
            from kmpc_tpu.utils.torch_import import (
                resume_train_state_from_torch,
            )

            state = resume_train_state_from_torch(checkpoint_path, cfg, state)
            start_step = int(state["step"])
        else:
            state, meta = load_checkpoint(checkpoint_path, state)
            start_step = int(meta["step"])
        if verbose:
            print(f"Resumed from checkpoint at step {start_step}")

    state, mesh, _ = _maybe_shard(cfg, model, state)
    if mesh is not None and verbose:
        print(f"SPMD mesh: {dict(mesh.shape)}")

    train_step = make_system_train_step(cfg, model, system)

    if verbose:
        print(f"Training {cfg.MODEL.MODEL_NAME} on {cfg.ENV.ENV_NAME}")
        print(f"Steps: {cfg.TRAIN.NUM_STEPS}  Batch: {cfg.TRAIN.BATCH_SIZE}")
        print(f"Run dir: {run_dir}")

    best_final_error = float("inf")
    eval_key = jax.random.fold_in(key, 999)
    eval_x0 = system.reset(eval_key, batch_size=4)

    spd = max(1, int(cfg.TRAIN.STEPS_PER_DISPATCH))
    if mesh is not None:
        spd = 1
    fused_cache: Dict[int, Any] = {}

    def run_steps(state, step, chunk):
        if spd == 1 or chunk == 1:
            skey = jax.random.fold_in(data_key, step)
            return train_step(state, skey)
        if chunk not in fused_cache:
            fused_cache[chunk] = make_fused_system_train_steps(
                cfg, model, system, chunk
            )
        return fused_cache[chunk](state, data_key, step)

    intervals = (cfg.TRAIN.LOG_INTERVAL, cfg.TRAIN.EVAL_INTERVAL)
    for step0, chunk in _dispatch_chunks(start_step, cfg.TRAIN.NUM_STEPS, spd, intervals):
        state, metrics = run_steps(state, step0, chunk)
        step = step0 + chunk - 1

        if step % cfg.TRAIN.LOG_INTERVAL == 0:
            host = {k: float(v) for k, v in metrics.items()}
            host.update(spectral_metrics(state["params"]))
            logger.log_dict(host, step, prefix="train")
            if verbose:
                print(f"Step {step}/{cfg.TRAIN.NUM_STEPS} | Loss: {host['loss']:.4f} | "
                      f"Res: {host['residual_loss']:.4f} | "
                      f"Recon: {host['reconst_loss']:.4f} | "
                      f"Sparsity: {host['sparsity_ratio']:.3f}")

        if step % cfg.TRAIN.EVAL_INTERVAL == 0 or step == cfg.TRAIN.NUM_STEPS - 1:
            eval_results = evaluate_system(
                model, state["params"], system, eval_x0, num_steps=200
            )
            logger.log_scalar("eval/mean_error", eval_results["mean_error"], step)
            logger.log_scalar("eval/final_error", eval_results["final_error"], step)
            if verbose:
                print(f"  Eval | Mean error: {eval_results['mean_error']:.4f} | "
                      f"Final error: {eval_results['final_error']:.4f}")

            done = int(state["step"])
            save_checkpoint(run_dir / "last", state, done, cfg.to_dict())
            if eval_results["final_error"] < best_final_error:
                best_final_error = eval_results["final_error"]
                save_checkpoint(run_dir / "checkpoint", state, done, cfg.to_dict())

    logger.close()
    _plot_training_curves(run_dir, verbose)

    if final_eval:
        _post_training_evaluation(cfg, model, state, run_dir, verbose)

    return state, model, run_dir


def _plot_training_curves(run_dir, verbose: bool = True) -> None:
    """End-of-run training-curve figure from metrics_history.jsonl
    (reference: train.py:510-519 — same best-effort semantics)."""
    try:
        from plot_training_metrics import plot_metrics

        out = Path(run_dir) / "training_metrics.png"
        plot_metrics(log_dir=Path(run_dir), save_path=out)
        if verbose:
            print(f"Training metrics plot saved to {out}")
    except Exception as e:  # pragma: no cover - plotting best-effort
        print(f"Warning: failed to plot training metrics: {e}")


def _post_training_evaluation(cfg, model, state, run_dir, verbose):
    """Evaluate last + best checkpoints with the standardized protocol
    (reference: train.py:944-1014)."""
    import json as _json

    from kmpc_tpu.eval.evaluation import EvaluationSettings, evaluate_model

    settings = EvaluationSettings(systems=(cfg.ENV.ENV_NAME,))
    for name in ("last", "checkpoint"):
        ckpt_dir = run_dir / name
        if not (ckpt_dir / "arrays.npz").exists():
            continue
        ck_state, meta = load_checkpoint(ckpt_dir, state)
        tag = "best" if name == "checkpoint" else "last"
        if verbose:
            print(f"Evaluating {tag} checkpoint (step {meta['step']})...")
        results = evaluate_model(
            model, ck_state["params"], cfg, settings,
            output_dir=run_dir / f"evaluation_{tag}", verbose=verbose,
        )
        with open(run_dir / f"evaluation_results_{tag}.json", "w") as f:
            _json.dump(results, f, indent=2)


def train(
    cfg: Config,
    log_dir: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    verbose: bool = True,
    final_eval: bool = False,
) -> Tuple[Dict, KoopmanModel, Path]:
    """Route to finance or dynamical-systems training
    (reference: train.py:752-775)."""
    if cfg.ENV.ENV_NAME.lower() == "finance":
        return train_finance(cfg, log_dir, checkpoint_path, verbose=verbose)
    return train_system(cfg, log_dir, checkpoint_path, verbose=verbose,
                        final_eval=final_eval)

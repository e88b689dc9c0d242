"""Vmapped hyperparameter sweep: all sparsity coefficients train at once.

TPU-native rebuild of the reference sparsity sweep
(reference: sweep_sparsity.py:9-150), which launches one subprocess per
coefficient and re-trains from scratch 13 times. Here the sweep axis is
just another batch axis: the ENTIRE train state (params + optimizer
state) is vmapped over the coefficient vector, so one jitted step
advances every run simultaneously — the sweep costs one training run's
wall-clock on a chip with headroom (SURVEY.md §7 design principles:
"the sparsity sweep becomes one more vmapped/sharded axis").
"""

from __future__ import annotations

import json
from datetime import datetime
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kmpc_tpu.config import Config
from kmpc_tpu.data.systems import make_system, system_dt
from kmpc_tpu.models.koopman import KoopmanModel, make_model
from kmpc_tpu.ops.rollout import rollout
from kmpc_tpu.train.loop import build_optimizer


def _sweep_loss(model: KoopmanModel, cfg: Config, params, batch, coeff, dt):
    """Sequence/pairwise loss with a DYNAMIC sparsity coefficient.

    The component losses come from the model (computed once); the total
    is re-weighted with the traced ``coeff``, so one compiled program
    serves every sweep value.
    """
    if cfg.TRAIN.USE_SEQUENCE_LOSS:
        _, metrics = model.loss_sequence(params, batch, dt)
    else:
        x, nx = batch
        _, metrics = model.loss(params, x, nx)
    total = (
        model.res_coeff * metrics["residual_loss"]
        + model.reconst_coeff * metrics["reconst_loss"]
        + model.pred_coeff * metrics["prediction_loss"]
        + coeff * metrics["sparsity_loss"]
    )
    metrics = dict(metrics, loss=total)
    return total, metrics


def make_sweep_train_step(cfg: Config, model: KoopmanModel, dt: float):
    """(stacked_state, batch, coeffs [S]) -> (stacked_state, metrics [S])."""
    tx = build_optimizer(cfg, None)

    def single_step(state, batch, coeff):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: _sweep_loss(model, cfg, p, batch, coeff, dt), has_aux=True
        )(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            metrics,
        )

    vstep = jax.vmap(single_step, in_axes=(0, None, 0))
    return jax.jit(vstep, donate_argnums=(0,))


def make_fused_sweep_step(cfg: Config, model: KoopmanModel, system,
                          steps_per_dispatch: int = 1):
    """Sweep step with on-device data generation AND ``steps_per_dispatch``
    optimizer steps fused into ONE jitted program:
    (stacked_state, data_key, start_step, coeffs [S]) ->
    (stacked_state, last-step metrics [S]).

    Per-dispatch relay latency is ~30 ms on remote-execution backends
    (CLAUDE.md), so a per-step dispatch loop pays minutes of pure latency
    over a long sweep; fusing K steps amortizes it exactly like
    train/loop.py's finance path. Per-step batch keys are
    ``fold_in(data_key, step)`` — bit-identical to the unfused stream.
    """
    tx = build_optimizer(cfg, None)
    B = cfg.TRAIN.BATCH_SIZE
    T = cfg.TRAIN.SEQUENCE_LENGTH
    use_seq = cfg.TRAIN.USE_SEQUENCE_LOSS
    dt = system.dt

    def single_step(state, batch, coeff):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: _sweep_loss(model, cfg, p, batch, coeff, dt), has_aux=True
        )(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            metrics,
        )

    vstep = jax.vmap(single_step, in_axes=(0, None, 0))

    def one_step(states, key, coeffs):
        if use_seq:
            batch = system.sequence_batch(key, B, T)
        else:
            x = system.reset(key, B)
            batch = (x, system.step(x))
        return vstep(states, batch, coeffs)

    @partial(jax.jit, donate_argnums=(0,))
    def fused(states, data_key, start_step, coeffs):
        def body(states, i):
            bkey = jax.random.fold_in(data_key, start_step + i)
            return one_step(states, bkey, coeffs)

        states, metrics = jax.lax.scan(
            body, states, jnp.arange(steps_per_dispatch)
        )
        # Report the chunk's LAST step, matching the unfused loop.
        return states, jax.tree.map(lambda m: m[-1], metrics)

    return fused


def stack_states(cfg: Config, model: KoopmanModel, key: jax.Array, n: int) -> Dict:
    """n identical initial train states stacked on a leading sweep axis
    (same init for every coefficient — matches the reference's fixed-seed
    subprocess runs, sweep_sparsity.py:39-46)."""
    from kmpc_tpu.train.loop import init_train_state

    state = init_train_state(cfg, model, key)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), state)


def run_sparsity_sweep(
    cfg: Config,
    coefficients: Sequence[float],
    log_dir: Optional[str] = None,
    eval_horizon: int = 100,
    eval_batch: int = 32,
    verbose: bool = True,
) -> Tuple[Dict, Path]:
    """Train one model per sparsity coefficient (simultaneously) and
    evaluate no-reencode rollout MSE + sparsity ratio per coefficient.

    Returns (results dict, run_dir). Results mirror the reference's
    sweep JSON (sparsity_sweep_results.json, sweep_sparsity.py:112-150).
    """
    if log_dir is None:
        log_dir = "./runs/sparsity_sweep"
    run_dir = Path(log_dir) / datetime.now().strftime("%Y%m%d-%H%M%S")
    run_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_json(str(run_dir / "config.json"))

    coeffs = jnp.asarray(list(coefficients), dtype=jnp.float32)
    S = len(coefficients)

    system = make_system(cfg)
    dt = system_dt(cfg)
    model = make_model(cfg, system.observation_size)

    key = jax.random.PRNGKey(cfg.SEED)
    init_key, data_key, eval_key = jax.random.split(key, 3)
    states = stack_states(cfg, model, init_key, S)

    # Fused multi-step dispatch (chunk-size-cached factories, same scheme
    # as train/loop.py): log steps land on chunk ends so their metrics
    # match the per-step loop exactly.
    from kmpc_tpu.train.loop import _dispatch_chunks

    spd = max(1, int(cfg.TRAIN.STEPS_PER_DISPATCH))
    fused_cache = {}

    def step_chunk(states, step0, chunk):
        if chunk not in fused_cache:
            fused_cache[chunk] = make_fused_sweep_step(
                cfg, model, system, steps_per_dispatch=chunk
            )
        return fused_cache[chunk](states, data_key, step0, coeffs)

    log_every = max(cfg.TRAIN.LOG_INTERVAL, 1)
    for step0, chunk in _dispatch_chunks(
        0, cfg.TRAIN.NUM_STEPS, spd, (log_every,)
    ):
        states, metrics = step_chunk(states, step0, chunk)
        step = step0 + chunk - 1
        if verbose and step % log_every == 0:
            losses = np.asarray(metrics["loss"])
            print(f"sweep step {step}/{cfg.TRAIN.NUM_STEPS} "
                  f"loss[min={losses.min():.4f} max={losses.max():.4f}]")

    # Per-coefficient evaluation: no-reencode MSE at the horizon + sparsity.
    x0 = system.reset(eval_key, eval_batch)
    true = system.trajectory(x0, eval_horizon)                    # [T, B, D]

    def eval_one(params):
        pred = rollout(model, params, x0, eval_horizon, reencode_period=0)
        sq = jnp.sum((pred - true) ** 2, axis=-1)
        sq = jnp.where(jnp.isfinite(sq), sq, jnp.nan)
        mse = jnp.nanmean(sq)
        z = model.encode(params, x0)
        nonzero = jnp.mean(jnp.sum((jnp.abs(z) > 1e-6).astype(jnp.float32), axis=-1))
        sparsity_ratio = 1.0 - nonzero / model.target_size
        return mse, sparsity_ratio

    mses, ratios = jax.vmap(eval_one)(states["params"])

    results = {
        "coefficients": [float(c) for c in coefficients],
        "no_reencode_mse": np.asarray(mses).tolist(),
        "sparsity_ratio": np.asarray(ratios).tolist(),
        "horizon": eval_horizon,
        "env": cfg.ENV.ENV_NAME,
        "num_steps": cfg.TRAIN.NUM_STEPS,
    }
    with open(run_dir / "sparsity_sweep_results.json", "w") as f:
        json.dump(results, f, indent=2)

    _plot_sweep(results, run_dir / "sparsity_sweep.png")
    return results, run_dir


def _plot_sweep(results: Dict, path: Path):
    """Dual-axis error / sparsity-ratio plot (reference:
    sweep_sparsity.py:112-150)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    coeffs = results["coefficients"]
    fig, ax1 = plt.subplots(figsize=(8, 5))
    ax1.plot(coeffs, results["no_reencode_mse"], "o-", color="#e74c3c")
    ax1.set_xlabel("sparsity coefficient")
    ax1.set_ylabel("no-reencode MSE", color="#e74c3c")
    ax1.set_xscale("symlog", linthresh=1e-4)
    ax1.set_yscale("log")
    ax2 = ax1.twinx()
    ax2.plot(coeffs, results["sparsity_ratio"], "s-", color="#3498db")
    ax2.set_ylabel("sparsity ratio", color="#3498db")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)

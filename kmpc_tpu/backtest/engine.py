"""Backtesting engine: scan-based exact path + parallel fixed-point path.

TPU-native rebuild of the reference backtest loop and strategies
(reference: backtest.py:57-249, baselines.py:24-187). Design divergences,
on purpose:

- Strategies split into (a) a heavy PRECOMPUTE pass that runs ONCE,
  batched over every backtest date (Koopman H-step forecasts, DMD linear
  rollouts, Markowitz rolling moments) and (b) a cheap jittable
  ``rebalance`` that consumes precomputed per-date data. The reference
  re-runs model rollouts and rolling-window estimation from scratch
  inside the Python date loop (reference: backtest.py:99-121,
  baselines.py:70-88).
- Two execution paths over dates:
    * ``run_backtest`` — exact reference semantics: lax.scan over dates
      (replaces the sequential per-date ECOS solve, reference:
      backtest.py:173-219); per-date warm starts are available but
      opt-in (see KoopmanMPCStrategy.use_warm_start).
    * ``run_backtest_parallel`` — Jacobi fixed-point sweeps: solve ALL
      dates' MPCs simultaneously given guessed pre-trade weights, then
      rerun the (cheap) wealth/drift recursion to update the guesses;
      repeat. The date coupling is weak (pre-trade weights only enter
      the transaction-cost term and the t-step turnover cap), so a
      handful of sweeps converge — and each sweep is one fully batched
      solve on the chip (SURVEY.md §2 "Scenario/date parallel").
- Rebalance-frequency semantics preserved exactly: the loop advances by
  ``rebalance_freq`` and applies only the return at t+1 (reference:
  backtest.py:163-199 — intermediate-day returns are skipped for
  freq > 1; kept for parity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kmpc_tpu.config import BacktestConfig
from kmpc_tpu.data.finance import FinanceData
from kmpc_tpu.models.koopman import KoopmanModel
from kmpc_tpu.ops.mpc import (
    MPCParams,
    solve_mpc_log_utility_batch,
    solve_mpc_mean_variance_batch,
)
from kmpc_tpu.ops.rollout import predict_returns


# ---------------------------------------------------------------------------
# Strategies
# ---------------------------------------------------------------------------


@dataclass
class BuyAndHoldStrategy:
    """Equal weight at t=0, then drift (reference: backtest.py:57-65)."""

    def precompute(self, fd: FinanceData, horizon: int) -> Dict[str, Any]:
        return {"n_assets": fd.n_assets}

    def rebalance(self, aux, t: jax.Array, current_weights: jax.Array, warm):
        n = current_weights.shape[-1]
        equal = jnp.full_like(current_weights, 1.0 / n)
        target = jnp.where(t == 0, equal, current_weights)
        return target, warm

    def rebalance_all(self, aux, current_weights: jax.Array) -> jax.Array:
        # [T, N] guessed pre-trade weights -> [T, N] targets
        n = current_weights.shape[-1]
        out = current_weights
        return out.at[0].set(jnp.full((n,), 1.0 / n, out.dtype))


class LogUtilityMPCRebalanceMixin:
    """Shared rebalance logic for strategies that forecast per-date
    log-returns (``aux['pred_log_returns']`` [T, H, N]) and solve the
    log-utility MPC: the Koopman strategy and the DMD baseline differ
    only in how the forecast is produced (reference: backtest.py:99-131
    vs baselines.py:147-187 — the reference duplicates this block).

    Host classes provide ``mpc`` (MPCParams), ``use_warm_start`` and
    ``use_fused_kernel`` attributes plus a ``precompute`` that fills
    ``aux['pred_log_returns']``.
    """

    def rebalance(self, aux, t, current_weights, warm):
        preds = aux["pred_log_returns"][t]                  # [H, N]
        w_warm, p_warm = (warm if self.use_warm_start else (None, None))
        w, info = solve_mpc_log_utility_batch(
            current_weights, preds, self.mpc, w_warm=w_warm, p_warm=p_warm
        )
        return w[..., 0, :], (w, info["dual"])

    def rebalance_all(self, aux, current_weights):
        # current_weights: [T, N]; batch-solve all dates at once.
        if self.use_fused_kernel:
            from kmpc_tpu.ops.mpc_pallas import (
                solve_mpc_log_utility_pallas_packed,
            )
            w, _ = solve_mpc_log_utility_pallas_packed(
                current_weights, aux["pred_log_returns"], self.mpc
            )
            return w[:, 0, :]
        w, _ = solve_mpc_log_utility_batch(
            current_weights, aux["pred_log_returns"], self.mpc
        )
        return w[:, 0, :]

    def rebalance_all_warm(self, aux, current_weights, warm, max_iters=None):
        """All-dates solve carrying (primal, dual) iterates across Jacobi
        sweeps. Between sweeps only the pre-trade weights move (and less
        each sweep), so warm sweeps need a fraction of the cold budget —
        see make_parallel_backtester(warm_sweeps_iters=...)."""
        from dataclasses import replace

        mpc = self.mpc if max_iters is None else replace(
            self.mpc, max_iters=max_iters
        )
        w_warm, p_warm = warm if warm is not None else (None, None)
        if self.use_fused_kernel:
            from kmpc_tpu.ops.mpc_pallas import (
                solve_mpc_log_utility_pallas_packed,
            )
            w, info = solve_mpc_log_utility_pallas_packed(
                current_weights, aux["pred_log_returns"], mpc,
                w_warm=w_warm, p_warm=p_warm, return_dual=True,
            )
        else:
            w, info = solve_mpc_log_utility_batch(
                current_weights, aux["pred_log_returns"], mpc,
                w_warm=w_warm, p_warm=p_warm,
            )
        return w[:, 0, :], (w, info["dual"])


@dataclass
class KoopmanMPCStrategy(LogUtilityMPCRebalanceMixin):
    """Koopman forecast + log-utility MPC (reference: backtest.py:67-131).

    ``use_warm_start`` seeds each date's PDHG from the previous date's
    primal/dual solution (faster at a fixed iteration budget) but, on
    the near-flat faces of this LP-like program, warm and cold starts
    can land on different equally-optimal points — breaking exact
    agreement with the cold-started parallel path. Off by default:
    determinism over a few hundred saved iterations.
    """

    model: KoopmanModel
    params: Dict
    mpc: MPCParams
    use_warm_start: bool = False
    use_fused_kernel: bool = False  # batch-in-lanes Pallas solver for the
    # parallel (all-dates) path: ~1.5x faster, but an epsilon-different
    # iterate on degenerate flat faces — opt-in so the scan-vs-parallel
    # exactness guarantee keeps holding by default.

    def precompute(self, fd: FinanceData, horizon: int) -> Dict[str, Any]:
        """One batched H-step forecast for EVERY test date."""
        preds = predict_returns(
            self.model, self.params, fd.test, horizon,
            fd.n_assets, fd.mean, fd.std,
        )  # [T, H, N]
        return {"pred_log_returns": preds}


@dataclass
class ScenarioKoopmanMPCStrategy:
    """Stochastic-Kelly variant: each date solves the scenario-averaged
    MPC over ``num_scenarios`` Monte-Carlo return paths sampled around
    the Koopman point forecast (no reference counterpart — the reference
    MPC consumes one deterministic forecast per date; see
    ops/scenario.py)."""

    model: KoopmanModel
    params: Dict
    mpc: MPCParams
    num_scenarios: int = 32
    seed: int = 0
    residual_std: Optional[jax.Array] = None  # [H, N]; estimated if None
    use_fused_kernel: bool = False  # see KoopmanMPCStrategy

    def precompute(self, fd: FinanceData, horizon: int) -> Dict[str, Any]:
        from kmpc_tpu.ops.scenario import (
            estimate_residual_std,
            generate_return_scenarios,
        )

        preds = predict_returns(
            self.model, self.params, fd.test, horizon,
            fd.n_assets, fd.mean, fd.std,
        )  # [T, H, N]
        rstd = self.residual_std
        if rstd is None:
            rstd = estimate_residual_std(
                self.model, self.params, fd.val, horizon,
                fd.n_assets, fd.mean, fd.std,
            )
        scen = generate_return_scenarios(
            preds, rstd, self.num_scenarios, jax.random.PRNGKey(self.seed)
        )  # [T, S, H, N]
        return {"scenario_log_returns": scen}

    def rebalance(self, aux, t, current_weights, warm):
        from kmpc_tpu.ops.scenario import solve_mpc_log_utility_scenarios

        scen = aux["scenario_log_returns"][t]               # [S, H, N]
        w, _ = solve_mpc_log_utility_scenarios(current_weights, scen, self.mpc)
        return w[..., 0, :], warm

    def rebalance_all(self, aux, current_weights):
        from kmpc_tpu.ops.scenario import solve_mpc_log_utility_scenarios

        if self.use_fused_kernel:
            from kmpc_tpu.ops.mpc_pallas import (
                solve_mpc_log_utility_scenarios_packed,
            )
            w, _ = solve_mpc_log_utility_scenarios_packed(
                current_weights, aux["scenario_log_returns"], self.mpc
            )
            return w[:, 0, :]
        w, _ = solve_mpc_log_utility_scenarios(
            current_weights, aux["scenario_log_returns"], self.mpc
        )
        return w[:, 0, :]

    def rebalance_all_warm(self, aux, current_weights, warm, max_iters=None):
        """All-dates scenario solve carrying (primal, dual) iterates
        across Jacobi sweeps (same contract as
        KoopmanMPCStrategy.rebalance_all_warm)."""
        from dataclasses import replace

        from kmpc_tpu.ops.scenario import solve_mpc_log_utility_scenarios

        mpc = self.mpc if max_iters is None else replace(
            self.mpc, max_iters=max_iters
        )
        w_warm, p_warm = warm if warm is not None else (None, None)
        if self.use_fused_kernel:
            from kmpc_tpu.ops.mpc_pallas import (
                solve_mpc_log_utility_scenarios_packed,
            )
            w, info = solve_mpc_log_utility_scenarios_packed(
                current_weights, aux["scenario_log_returns"], mpc,
                w_warm=w_warm, p_warm=p_warm, return_dual=True,
            )
        else:
            w, info = solve_mpc_log_utility_scenarios(
                current_weights, aux["scenario_log_returns"], mpc,
                w_warm=w_warm, p_warm=p_warm,
            )
        return w[:, 0, :], (w, info["dual"])


@dataclass
class DMDStrategy(LogUtilityMPCRebalanceMixin):
    """Linear-Koopman baseline: K = X' pinv(X) on train embeddings, linear
    rollout, same MPC (reference: baselines.py:109-187)."""

    mpc: MPCParams
    K: Optional[jax.Array] = None  # [obs, obs], x_{t+1} = K x_t (column form)
    use_warm_start: bool = False
    use_fused_kernel: bool = False  # read by the shared rebalance_all

    def fit(self, train_data: jax.Array) -> "DMDStrategy":
        X = train_data[:-1].T                               # [obs, T-1]
        Xp = train_data[1:].T
        self.K = Xp @ jnp.linalg.pinv(X)
        return self

    def precompute(self, fd: FinanceData, horizon: int) -> Dict[str, Any]:
        if self.K is None:
            self.fit(fd.train)

        def body(x, _):
            nx = x @ self.K.T                               # row form
            ret = nx[..., : fd.n_assets] * fd.std + fd.mean
            return nx, ret

        _, rets = jax.lax.scan(body, fd.test, None, length=horizon)
        preds = jnp.moveaxis(rets, 0, 1)                    # [T, H, N]
        return {"pred_log_returns": preds}


@dataclass
class MarkowitzStrategy:
    """Rolling mean-variance (reference: baselines.py:24-106).

    Precomputes rolling-window mu/Sigma for all dates in one masked
    batched pass; dates with <5 samples hold current weights
    (reference: baselines.py:76-78).
    """

    mpc: MPCParams
    lookback_window: int = 60
    min_samples: int = 5
    use_fused_kernel: bool = False  # batch-in-lanes Pallas MV solver for
                                    # the all-dates (parallel) path

    def precompute(self, fd: FinanceData, horizon: int) -> Dict[str, Any]:
        rets = fd.destandardize_returns(
            fd.extract_current_returns(fd.test)
        )  # [T, N]
        T, N = rets.shape
        W = self.lookback_window

        # Window of the last W returns ending at t (inclusive), masked.
        offsets = jnp.arange(W) - (W - 1)                   # [-W+1 .. 0]
        idx = jnp.arange(T)[:, None] + offsets[None, :]     # [T, W]
        valid = idx >= 0
        idx = jnp.clip(idx, 0, T - 1)
        win = rets[idx]                                     # [T, W, N]
        m = valid[..., None].astype(rets.dtype)
        count = jnp.sum(m, axis=1)                          # [T, 1]
        mu = jnp.sum(win * m, axis=1) / jnp.maximum(count, 1.0)
        centered = (win - mu[:, None, :]) * m
        denom = jnp.maximum(count[..., None] - 1.0, 1.0)    # np.cov ddof=1
        sigma = jnp.einsum("twn,twm->tnm", centered, centered) / denom
        sigma = sigma + 1e-6 * jnp.eye(N, dtype=rets.dtype)  # ridge (baselines.py:88)
        has_data = count[:, 0] >= self.min_samples
        return {"mu": mu, "sigma": sigma, "has_data": has_data}

    def rebalance(self, aux, t, current_weights, warm):
        mu = aux["mu"][t][None, :]                           # horizon 1
        sigma = aux["sigma"][t]
        w, _ = solve_mpc_mean_variance_batch(current_weights, mu, sigma, self.mpc)
        target = jnp.where(aux["has_data"][t], w[..., 0, :], current_weights)
        return target, warm

    def rebalance_all(self, aux, current_weights):
        if self.use_fused_kernel:
            from kmpc_tpu.ops.mpc_pallas import (
                solve_mpc_mean_variance_pallas_packed,
            )

            w, _ = solve_mpc_mean_variance_pallas_packed(
                current_weights, aux["mu"][:, None, :], aux["sigma"],
                self.mpc,
            )
        else:
            w, _ = solve_mpc_mean_variance_batch(
                current_weights, aux["mu"][:, None, :], aux["sigma"],
                self.mpc,
            )
        return jnp.where(aux["has_data"][:, None], w[:, 0, :], current_weights)


# ---------------------------------------------------------------------------
# Market step (shared wealth/drift recursion, reference: backtest.py:177-208)
# ---------------------------------------------------------------------------


def _market_step(portfolio_value, current_weights, target_weights, realized_ret,
                 has_next, cost_coeff):
    """One date's cost + growth + drift. All inputs broadcastable."""
    turnover = jnp.sum(jnp.abs(target_weights - current_weights), axis=-1)
    cost = cost_coeff * turnover * portfolio_value
    value = portfolio_value - cost

    gross = jnp.exp(realized_ret) - 1.0
    port_ret = jnp.where(has_next, jnp.sum(target_weights * gross, axis=-1), 0.0)
    value = value * (1.0 + port_ret)

    # Weight drift (reference: backtest.py:202-208 divides by 1 + r_p
    # directly). Guard only the exactly-singular point: the clamp must
    # PRESERVE SIGN — mapping a ruin-day denominator in (-1e-8, 0) to
    # +1e-8 would silently negate every drifted weight relative to the
    # reference recursion. jnp.sign(0) == 0, so the 0 case is pinned
    # positive explicitly.
    denom = 1.0 + port_ret
    sign = jnp.where(denom < 0.0, -1.0, 1.0)
    denom = jnp.where(jnp.abs(denom) < 1e-8, sign * 1e-8, denom)
    drifted = target_weights * (1.0 + gross) / denom[..., None]
    new_weights = jnp.where(has_next[..., None], drifted, target_weights)
    return value, new_weights, port_ret, turnover, cost


# ---------------------------------------------------------------------------
# Exact scan path (reference semantics)
# ---------------------------------------------------------------------------


def make_backtester(
    strategy,
    fd: FinanceData,
    config: BacktestConfig,
):
    """Build a reusable compiled sequential backtester.

    Returns ``(run, ts)``: ``run()`` executes the whole date scan as one
    compiled program; repeated calls pay zero retrace (mirror of
    :func:`make_parallel_backtester` — a bare ``run_backtest`` call
    builds a fresh closure and therefore recompiles).
    """
    # The reference iterates over len(test_dataset) - horizon dates, and
    # its Dataset is sequence_length shorter than the raw split
    # (reference: backtest.py:150, data_finance.py:389) — preserved
    # exactly, including the freq>1 skip-return quirk.
    n_steps = fd.test.shape[0] - fd.sequence_length - config.HORIZON
    ts = np.arange(0, n_steps, config.REBALANCE_FREQ)
    aux = strategy.precompute(fd, config.HORIZON)

    all_returns = fd.destandardize_returns(
        fd.extract_current_returns(fd.test)
    )  # [T, N] raw-scale log-returns (reference: backtest.py:167-171)

    n = fd.n_assets
    H = config.HORIZON
    w0 = jnp.full((n,), 1.0 / n, dtype=jnp.float32)
    warm0 = (
        jnp.tile(w0[None, :], (H, 1)),
        jnp.zeros((H, n), dtype=jnp.float32),
    )

    t_len = all_returns.shape[0]
    ts_j = jnp.asarray(ts)

    # aux/returns enter as ARGUMENTS: arrays captured in a jit closure are
    # embedded into the program as constants, which bloats the executable
    # (and exceeds remote-compile payload limits at 500-asset scale).
    @jax.jit
    def _run(aux_arg, returns_arg):
        def scan_body(carry, t):
            value, weights, warm = carry
            target, warm = strategy.rebalance(aux_arg, t, weights, warm)
            has_next = t + 1 < t_len
            realized = returns_arg[jnp.minimum(t + 1, t_len - 1)]
            value, new_weights, port_ret, turnover, cost = _market_step(
                value, weights, target, realized, has_next, config.COST_COEFF
            )
            out = {
                "portfolio_value": value,
                "return": port_ret,
                "turnover": turnover,
                "cost": cost,
                "weights": target,
            }
            return (value, new_weights, warm), out

        init = (jnp.asarray(config.INITIAL_CAPITAL, jnp.float32), w0, warm0)
        (_, _, _), history = jax.lax.scan(scan_body, init, ts_j)
        return history

    def run():
        return _run(aux, all_returns)

    return run, ts


def run_backtest(
    strategy,
    fd: FinanceData,
    config: BacktestConfig,
    return_dataframe: bool = True,
):
    """Sequential-semantics backtest as one jitted lax.scan over dates.

    Returns a pandas DataFrame with the reference's history schema
    (date, portfolio_value, return, turnover, cost —
    reference: backtest.py:211-217) or the raw arrays dict. For repeated
    runs, build once with :func:`make_backtester`.
    """
    run, ts = make_backtester(strategy, fd, config)
    history = run()
    history = {k: np.asarray(v) for k, v in history.items()}
    history["t"] = ts

    if not return_dataframe:
        return history
    return _history_to_dataframe(history, fd, ts)


def _history_to_dataframe(history, fd: FinanceData, ts):
    import pandas as pd

    return pd.DataFrame(
        {
            "date": [fd.test_dates[int(t)] for t in ts],
            "portfolio_value": history["portfolio_value"],
            "return": history["return"],
            "turnover": history["turnover"],
            "cost": history["cost"],
        }
    )


# ---------------------------------------------------------------------------
# Parallel fixed-point path (TPU-first; SURVEY.md §2/§7)
# ---------------------------------------------------------------------------


def _sharded_rebalance_fns(strategy, mesh, aux, T: int):
    """Date-axis-sharded all-dates rebalance wrappers.

    Shards the [T, ...] date axis of the Jacobi sweep's batched solve
    across the mesh's ('data','scenario') axes with ``jax.shard_map`` —
    the workload's "DP" (SURVEY §2 "Scenario/date parallel"; replaces
    the reference's sequential date loop, reference: backtest.py:163-173)
    — so a pod slice solves T/n_devices dates per chip per sweep. T is
    edge-padded up to a multiple of the device count (padded dates solve
    a copy of the last date and are dropped); the cheap sequential
    wealth recursion stays replicated, XLA inserting the all-gather of
    the targets automatically.
    """
    spec = jax.sharding.PartitionSpec(("data", "scenario"))
    rep = jax.sharding.PartitionSpec()
    nd = mesh.shape["data"] * mesh.shape["scenario"]
    Tp = -(-T // nd) * nd

    def _is_dated(a):
        return hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == T

    def _pad(a):
        if Tp == T or not _is_dated(a):
            return a
        return jnp.concatenate(
            [a, jnp.repeat(a[-1:], Tp - T, axis=0)], axis=0
        )

    aux_specs = jax.tree.map(lambda a: spec if _is_dated(a) else rep, aux)

    def rebalance_all(aux_arg, guess):
        f = jax.shard_map(
            strategy.rebalance_all, mesh=mesh,
            in_specs=(aux_specs, spec), out_specs=spec,
            # pallas_call carries no varying-mesh-axes annotation; the
            # per-date outputs vary on the date axis only.
            check_vma=False,
        )
        tgt = f(jax.tree.map(_pad, aux_arg), _pad(guess))
        return tgt[:T]

    def rebalance_all_warm(aux_arg, guess, warm, max_iters=None):
        def local(a, g, wm):
            return strategy.rebalance_all_warm(a, g, wm, max_iters=max_iters)

        # warm is None on the cold first sweep; afterwards a (primal,
        # dual) tuple of [Tp, H, N] arrays that STAYS padded across
        # sweeps (shape-stable scan carry), so _pad passes it through.
        warm_specs = jax.tree.map(lambda _: spec, warm)
        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(aux_specs, spec, warm_specs),
            out_specs=(spec, (spec, spec)),
            check_vma=False,
        )
        tgt, wm = f(jax.tree.map(_pad, aux_arg), _pad(guess),
                    jax.tree.map(_pad, warm))
        return tgt[:T], wm

    return rebalance_all, rebalance_all_warm


def make_parallel_backtester(
    strategy,
    fd: FinanceData,
    config: BacktestConfig,
    num_sweeps: int = 8,
    warm_sweeps_iters: Optional[int] = None,
    mesh=None,
):
    """Build a reusable compiled Jacobi backtester.

    Returns ``(run, ts)`` where ``run()`` executes ``num_sweeps`` sweeps
    and the final history in ONE jitted program (sweep loop included, so
    repeated calls pay zero retrace), and ``ts`` are the rebalance dates.

    ``warm_sweeps_iters`` (requires a strategy with ``rebalance_all_warm``,
    e.g. KoopmanMPCStrategy): sweep 1 solves cold at the strategy's full
    iteration budget; every later sweep warm-starts from the previous
    sweep's (primal, dual) iterates and runs only this many PDHG
    iterations. Between sweeps only the pre-trade weights move — and
    less each sweep — so a quarter-budget warm sweep tracks the cold
    fixed point to backtest tolerance at a fraction of the cost.

    ``mesh`` (a ('data','scenario','model') jax Mesh, see
    parallel/mesh.py): shards the DATE axis of every sweep's batched
    solve across the mesh's data x scenario devices — each chip solves
    its date shard, the cheap wealth recursion stays replicated.
    History equals the unsharded run's (same solves, scattered).
    """
    # Same date-count contract as make_backtester (reference:
    # backtest.py:150 over a Dataset sequence_length shorter than the
    # raw split, data_finance.py:389).
    n_steps = fd.test.shape[0] - fd.sequence_length - config.HORIZON
    ts = np.arange(0, n_steps, config.REBALANCE_FREQ)
    T = len(ts)
    aux = strategy.precompute(fd, config.HORIZON)

    all_returns = fd.destandardize_returns(fd.extract_current_returns(fd.test))
    n = fd.n_assets
    t_len = all_returns.shape[0]
    ts_j = jnp.asarray(ts)

    # Slice per-date aux to the rebalance dates.
    aux_t = jax.tree.map(
        lambda a: a[ts_j] if hasattr(a, "shape") and a.shape[:1] == (fd.test.shape[0],) else a,
        aux,
    )

    def recursion(returns_arg, targets):
        # Cheap wealth/drift recursion to recover implied pre-trade
        # weights (sequential but trivially cheap: [N]-sized ops).
        def body(carry, inp):
            value, weights = carry
            t, target = inp
            has_next = t + 1 < t_len
            realized = returns_arg[jnp.minimum(t + 1, t_len - 1)]
            value, new_weights, port_ret, turnover, cost = _market_step(
                value, weights, target, realized, has_next, config.COST_COEFF
            )
            out = {
                "pre_trade": weights,
                "portfolio_value": value,
                "return": port_ret,
                "turnover": turnover,
                "cost": cost,
                "weights": target,
            }
            return (value, new_weights), out

        init = (
            jnp.asarray(config.INITIAL_CAPITAL, jnp.float32),
            jnp.full((n,), 1.0 / n, dtype=jnp.float32),
        )
        _, out = jax.lax.scan(body, init, (ts_j, targets))
        return out

    use_warm = warm_sweeps_iters is not None
    if use_warm and not hasattr(strategy, "rebalance_all_warm"):
        raise ValueError(
            "warm_sweeps_iters requires a strategy with rebalance_all_warm"
        )
    if use_warm and num_sweeps < 2:
        raise ValueError("warm_sweeps_iters needs num_sweeps >= 2")

    if mesh is not None:
        _rebalance_all, _rebalance_all_warm = _sharded_rebalance_fns(
            strategy, mesh, aux_t, T
        )
    else:
        _rebalance_all = strategy.rebalance_all
        _rebalance_all_warm = getattr(strategy, "rebalance_all_warm", None)

    def sweep(aux_arg, returns_arg, pre_trade_guess):
        # Batched rebalance for every date given guessed weights, then
        # the wealth recursion.
        targets = _rebalance_all(aux_arg, pre_trade_guess)  # [T, N]
        return recursion(returns_arg, targets)

    # aux/returns as ARGUMENTS (closure-captured device arrays would be
    # embedded as program constants — prohibitive at 500-asset scale).
    @jax.jit
    def _run(aux_arg, returns_arg):
        guess0 = jnp.full((T, n), 1.0 / n, dtype=jnp.float32)

        if use_warm:
            # Sweep 1: cold, full budget. Later sweeps: warm-started
            # quarter-ish budget; the (primal, dual) carry rides the
            # sweep scan.
            targets, warm = _rebalance_all_warm(
                aux_arg, guess0, None
            )
            guess = recursion(returns_arg, targets)["pre_trade"]

            def warm_body(carry, _):
                g, wm = carry
                tgt, wm = _rebalance_all_warm(
                    aux_arg, g, wm, max_iters=warm_sweeps_iters
                )
                return (recursion(returns_arg, tgt)["pre_trade"], wm), None

            (guess, warm), _ = jax.lax.scan(
                warm_body, (guess, warm), None,
                length=max(num_sweeps - 2, 0),
            )
            targets, _ = _rebalance_all_warm(
                aux_arg, guess, warm, max_iters=warm_sweeps_iters
            )
            return recursion(returns_arg, targets)

        def sweep_body(guess, _):
            return sweep(aux_arg, returns_arg, guess)["pre_trade"], None

        # num_sweeps - 1 guess refinements, then one final sweep for the
        # full history (all inside this one compiled program).
        guess, _ = jax.lax.scan(
            sweep_body, guess0, None, length=max(num_sweeps - 1, 0)
        )
        return sweep(aux_arg, returns_arg, guess)

    def run():
        return _run(aux_t, all_returns)

    return run, ts


def run_backtest_parallel(
    strategy,
    fd: FinanceData,
    config: BacktestConfig,
    num_sweeps: int = 8,
    return_dataframe: bool = True,
    warm_sweeps_iters: Optional[int] = None,
    mesh=None,
):
    """Backtest via Jacobi sweeps: batch-solve all dates, re-run the wealth
    recursion, iterate.

    Convergence: the date coupling is lower-triangular (weights drift
    forward in time), so each sweep propagates exact information one
    rebalance date further — ``num_sweeps >= number of dates`` is exact,
    while a handful of sweeps already yields ~0.1-0.3% wealth-trajectory
    accuracy because the per-date dependence of the MPC solution on the
    pre-trade weights is weak (cost term + turnover cap only). Use
    ``run_backtest`` when exact sequential semantics are required, and
    :func:`make_parallel_backtester` to amortize compilation over
    repeated runs."""
    run, ts = make_parallel_backtester(
        strategy, fd, config, num_sweeps,
        warm_sweeps_iters=warm_sweeps_iters, mesh=mesh,
    )
    history = run()
    history = {k: np.asarray(v) for k, v in history.items()}
    history["t"] = ts
    if not return_dataframe:
        return history
    return _history_to_dataframe(history, fd, ts)


# ---------------------------------------------------------------------------
# Metrics (reference: backtest.py:221-249)
# ---------------------------------------------------------------------------


def calculate_metrics(df) -> Dict[str, float]:
    """Annualized Sharpe, max drawdown, avg turnover, final value, total
    return — identical math to the reference."""
    if len(df) == 0:
        return {}
    returns = np.asarray(df["return"])
    mean_ret = np.mean(returns)
    std_ret = np.std(returns)
    sharpe = np.sqrt(252) * mean_ret / (std_ret + 1e-8)

    cum_returns = np.cumprod(1 + returns)
    peak = np.maximum.accumulate(cum_returns)
    drawdown = (cum_returns - peak) / peak
    max_dd = float(np.min(drawdown))

    values = np.asarray(df["portfolio_value"])
    return {
        "Sharpe Ratio": float(sharpe),
        "Max Drawdown": max_dd,
        "Avg Turnover": float(np.mean(np.asarray(df["turnover"]))),
        "Final Value": float(values[-1]),
        "Total Return": float(values[-1] / values[0] - 1.0),
    }

"""Reference-semantics parity: an INDEPENDENT float64 numpy
reimplementation of the reference's sequential backtest loop
(reference: backtest.py:133-219) using the high-accuracy oracle solver,
compared against the framework's compiled engine end-to-end.

This is the BASELINE.md parity check at the system level: same model,
same data, same loop semantics — the engine must reproduce the wealth /
turnover / Sharpe trajectory of a from-first-principles implementation.
"""

import sys
import warnings
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
from test_backtest import _mock_finance_data, _tiny_koopman

from kmpc_tpu.backtest.engine import (
    KoopmanMPCStrategy,
    calculate_metrics,
    run_backtest,
)
from kmpc_tpu.config import BacktestConfig
from kmpc_tpu.ops.mpc import MPCParams
from kmpc_tpu.ops.mpc_oracle import solve_mpc_log_utility_oracle

warnings.filterwarnings("ignore", message="delta_grad")


def _reference_style_backtest(model, params, fd, horizon, cost_coeff,
                              max_turnover, initial_capital=10_000.0):
    """Straight-line float64 reimplementation of the reference loop:
    per-date Python iteration, per-date Koopman rollout, per-date
    interior-point-quality solve, cost -> growth -> drift updates."""
    test = np.asarray(fd.test, dtype=np.float64)
    mean = np.asarray(fd.mean, dtype=np.float64)
    std = np.asarray(fd.std, dtype=np.float64)
    n_assets = fd.n_assets
    # Reference date count: len(test_dataset) - horizon, where the
    # Dataset is sequence_length(=1) shorter than the raw split
    # (reference: backtest.py:150, data_finance.py:389).
    n_steps = test.shape[0] - 1 - horizon

    all_returns = test[:, :n_assets] * std + mean

    value = initial_capital
    weights = np.full(n_assets, 1.0 / n_assets)
    history = {"portfolio_value": [], "return": [], "turnover": []}

    for t in range(n_steps):
        # Koopman forecast: encode -> H x (step_latent -> decode -> extract
        # -> destandardize), exactly the reference strategy's loop
        # (reference: backtest.py:99-121), via the model's public ops.
        obs = fd.test[t][None]
        z = model.encode(params, obs)
        preds = []
        for _ in range(horizon):
            z = model.step_latent(params, z)
            dec = model.decode(params, z)
            pred = np.asarray(dec, dtype=np.float64)[0, :n_assets] * std + mean
            preds.append(pred)
        pred_log_returns = np.stack(preds)

        w_opt, info = solve_mpc_log_utility_oracle(
            weights, pred_log_returns, cost_coeff=cost_coeff,
            max_turnover=max_turnover,
        )
        target = w_opt[0]

        turnover = np.abs(target - weights).sum()
        value -= cost_coeff * turnover * value
        weights = target

        port_ret = 0.0
        if t + 1 < len(all_returns):
            gross = np.exp(all_returns[t + 1]) - 1.0
            port_ret = float(np.sum(weights * gross))
            value *= 1.0 + port_ret
            denom = 1.0 + port_ret
            if abs(denom) < 1e-8:
                denom = 1e-8
            weights = weights * (1.0 + gross) / denom

        history["portfolio_value"].append(value)
        history["return"].append(port_ret)
        history["turnover"].append(turnover)
    return {k: np.asarray(v) for k, v in history.items()}


def test_engine_matches_reference_semantics():
    fd = _mock_finance_data(T=28, N=6, seed=21)
    model, params = _tiny_koopman(fd)
    horizon, cost, tau = 3, 0.001, 0.2

    ref = _reference_style_backtest(model, params, fd, horizon, cost, tau)

    strat = KoopmanMPCStrategy(
        model=model, params=params,
        mpc=MPCParams(horizon=horizon, cost_coeff=cost, max_turnover=tau,
                      max_iters=30000, sigma_scale=2.0),
    )
    df = run_backtest(strat, fd, BacktestConfig(HORIZON=horizon, COST_COEFF=cost))

    v_ref = ref["portfolio_value"]
    v_eng = np.asarray(df["portfolio_value"], dtype=np.float64)
    assert len(v_ref) == len(v_eng)
    # Wealth-trajectory parity.
    rel = np.max(np.abs(v_eng - v_ref) / v_ref)
    assert rel < 2e-3, f"wealth trajectory rel err {rel}"
    # Turnover-trajectory parity (solver-degeneracy tolerant).
    t_err = np.abs(np.asarray(df["turnover"]) - ref["turnover"])
    assert np.median(t_err) < 1e-3, np.median(t_err)
    # Sharpe parity.
    m_ref = calculate_metrics(
        {"return": ref["return"], "portfolio_value": ref["portfolio_value"],
         "turnover": ref["turnover"]}
    )
    m_eng = calculate_metrics(df)
    assert abs(m_ref["Sharpe Ratio"] - m_eng["Sharpe Ratio"]) < 0.05
    assert abs(m_ref["Max Drawdown"] - m_eng["Max Drawdown"]) < 0.01


@pytest.mark.slow
def test_fused_parallel_engine_matches_reference_semantics():
    """The FULL fast path — packed Pallas kernel (interpret mode on CPU),
    proj_refresh_every sweep schedule, Jacobi parallel backtest with
    num_sweeps >= #dates — must reproduce the same float64 reference
    reimplementation the sequential engine is held to."""
    from kmpc_tpu.backtest.engine import run_backtest_parallel

    fd = _mock_finance_data(T=24, N=6, seed=22)
    model, params = _tiny_koopman(fd)
    horizon, cost, tau = 3, 0.001, 0.2

    ref = _reference_style_backtest(model, params, fd, horizon, cost, tau)

    strat = KoopmanMPCStrategy(
        model=model, params=params,
        mpc=MPCParams(horizon=horizon, cost_coeff=cost, max_turnover=tau,
                      max_iters=10000, sigma_scale=2.0,
                      proj_refresh_every=16),
        use_fused_kernel=True,
    )
    n_dates = fd.test.shape[0] - fd.sequence_length - horizon
    df = run_backtest_parallel(
        strat, fd, BacktestConfig(HORIZON=horizon, COST_COEFF=cost),
        num_sweeps=n_dates,
    )

    v_ref = ref["portfolio_value"]
    v_eng = np.asarray(df["portfolio_value"], dtype=np.float64)
    assert len(v_ref) == len(v_eng)
    rel = np.max(np.abs(v_eng - v_ref) / v_ref)
    assert rel < 3e-3, f"wealth trajectory rel err {rel}"
    t_err = np.abs(np.asarray(df["turnover"]) - ref["turnover"])
    assert np.median(t_err) < 1.5e-3, np.median(t_err)
    m_ref = calculate_metrics(
        {"return": ref["return"], "portfolio_value": ref["portfolio_value"],
         "turnover": ref["turnover"]}
    )
    m_eng = calculate_metrics(df)
    assert abs(m_ref["Sharpe Ratio"] - m_eng["Sharpe Ratio"]) < 0.05
    assert abs(m_ref["Max Drawdown"] - m_eng["Max Drawdown"]) < 0.01

"""Backtest engine + strategy tests (mirrors reference tests/test_backtest.py
and tests/test_baselines.py: loop mechanics, DataFrame schema, metric math,
Markowitz hold behavior, dominant-asset optimization), plus scan-vs-parallel
path consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from kmpc_tpu.config import BacktestConfig, Config, FinanceConfig, get_config
from kmpc_tpu.backtest.engine import (
    BuyAndHoldStrategy,
    DMDStrategy,
    KoopmanMPCStrategy,
    MarkowitzStrategy,
    calculate_metrics,
    run_backtest,
    run_backtest_parallel,
)
from kmpc_tpu.data.finance import FinanceData, FinanceStats, load_finance_data
from kmpc_tpu.models import make_model
from kmpc_tpu.ops.mpc import MPCParams


def _mock_finance_data(T=60, N=4, seed=0, drift=None):
    """Synthetic FinanceData with controlled returns (replaces the
    reference's MockFinanceEnv, test_backtest.py:15-25)."""
    rng = np.random.default_rng(seed)
    rets = rng.standard_normal((T, N)).astype(np.float32) * 0.01
    if drift is not None:
        rets = rets + np.asarray(drift, dtype=np.float32)
    mean = rets[: T // 2].mean(0)
    std = np.maximum(rets[: T // 2].std(0), 1e-8)
    std_rets = (rets - mean) / std
    d = 2
    from kmpc_tpu.data.finance import time_delay_embedding

    emb = time_delay_embedding(std_rets, d)
    dates = pd.bdate_range("2021-01-01", periods=len(emb))
    half = len(emb) // 3
    stats = FinanceStats(mean=mean, std=std, tickers=[f"A{i}" for i in range(N)])
    meta = {"n_assets": N, "embedding_dim": d, "observation_size": d * N}
    return FinanceData(
        train=jnp.asarray(emb[:half]),
        val=jnp.asarray(emb[half : 2 * half]),
        test=jnp.asarray(emb),
        train_dates=dates[:half],
        val_dates=dates[half : 2 * half],
        test_dates=dates,
        stats=stats,
        metadata=meta,
        mean=jnp.asarray(mean),
        std=jnp.asarray(std),
        sequence_length=1,
    )


FAST_MPC = MPCParams(max_iters=300)


# ---------------------------------------------------------------------------
# Engine mechanics (reference: test_backtest.py:27-38)
# ---------------------------------------------------------------------------


def test_buy_and_hold_schema_and_mechanics():
    fd = _mock_finance_data()
    cfg = BacktestConfig(HORIZON=3)
    df = run_backtest(BuyAndHoldStrategy(), fd, cfg)
    assert set(df.columns) == {"date", "portfolio_value", "return", "turnover", "cost"}
    assert len(df) == fd.test.shape[0] - fd.sequence_length - cfg.HORIZON
    # t=0 rebalances from 1/N to 1/N: zero turnover throughout (drift only).
    assert float(df["turnover"].iloc[0]) < 1e-6
    assert (df["portfolio_value"] > 0).all()


def test_backtest_wealth_recursion_hand_check():
    """Single step of the wealth update matches hand calculation
    (reference: backtest.py:177-208)."""
    fd = _mock_finance_data(T=10, N=2, seed=1)
    cfg = BacktestConfig(HORIZON=2, COST_COEFF=0.01)
    df = run_backtest(BuyAndHoldStrategy(), fd, cfg)

    rets = np.asarray(fd.destandardize_returns(fd.extract_current_returns(fd.test)))
    w = np.array([0.5, 0.5])
    v = cfg.INITIAL_CAPITAL
    gross = np.exp(rets[1]) - 1.0
    port = np.sum(w * gross)
    v_expected = v * (1.0 + port)
    assert np.isclose(df["portfolio_value"].iloc[0], v_expected, rtol=1e-3)
    assert np.isclose(df["return"].iloc[0], port, rtol=1e-3)


def test_rebalance_freq():
    fd = _mock_finance_data(T=40)
    cfg = BacktestConfig(HORIZON=3, REBALANCE_FREQ=5)
    df = run_backtest(BuyAndHoldStrategy(), fd, cfg)
    n_steps = fd.test.shape[0] - fd.sequence_length - cfg.HORIZON
    assert len(df) == len(range(0, n_steps, 5))


def test_market_step_ruin_day_preserves_drift_sign():
    """Weight drift on a (near-)ruin day: the reference recursion divides
    by 1 + r_p directly (reference: backtest.py:202-208); our singular-
    point clamp must PRESERVE the denominator's sign — a portfolio return
    just below -100% (denom in (-1e-8, 0), reachable with a short
    position) must not flip every drifted weight's sign relative to the
    reference (round-2 VERDICT weak #3)."""
    from kmpc_tpu.backtest.engine import _market_step

    def drift_ref(target, gross):
        # Reference recursion, float64 numpy (backtest.py:202-208).
        g = np.asarray(gross, np.float64)
        t = np.asarray(target, np.float64)
        return t * (1.0 + g) / (1.0 + np.sum(t * g))

    def step(target, gross):
        log_ret = jnp.log1p(jnp.asarray(gross))
        v0 = jnp.asarray(1000.0, log_ret.dtype)
        t = jnp.asarray(target, log_ret.dtype)
        _, new_w, _, _, _ = _market_step(
            v0, t, t, log_ret, jnp.asarray(True), 0.0
        )
        return np.asarray(new_w)

    with jax.enable_x64(True):
        # (a) Ordinary and harsh-but-regular days: exact match (no clamp;
        # f64 so the exp(log1p(x)) round-trip near -1 stays exact).
        target = [0.6, 0.4]
        for gross in ([0.01, -0.02], [-0.9, -0.95], [-0.99999, -0.99998]):
            np.testing.assert_allclose(
                step(target, gross), drift_ref(target, gross), rtol=1e-5
            )

        # (b) Ruin day crossing -100%: a 2x-long / 1x-short book and a
        # -(50% + 2.5e-9) day on the long leg put the f64 denominator at
        # ~-5e-9 — inside the clamp window and NEGATIVE. The reference's
        # direct division yields large NEGATIVE drifted weights for the
        # long leg; the old sign-losing clamp (denom -> +1e-8) flipped
        # them.
        target = [2.0, -1.0]
        gross = [-0.5 - 2.5e-9, 0.0]
        denom_ref = 1.0 + np.sum(np.asarray(target) * np.asarray(gross))
        assert -1e-8 < denom_ref < 0.0          # the crafted singular window
        ours = step(target, gross)
        ref = drift_ref(target, gross)
        assert np.all(np.isfinite(ours))
        assert np.all(np.sign(ours) == np.sign(ref)), (ours, ref)

        # (c) Exactly-zero denominator: reference divides by zero (inf);
        # ours must stay finite with the long leg pinned NEGATIVE-free
        # (positive clamp, matching the numerator's direction for a
        # wiped-out long book) — finiteness is the contract here.
        gross0 = [-0.5, 0.0]
        assert 1.0 + np.sum(np.asarray(target) * np.asarray(gross0)) == 0.0
        ours0 = step(target, gross0)
        assert np.all(np.isfinite(ours0))


# ---------------------------------------------------------------------------
# Metrics (reference: test_backtest.py:40-52)
# ---------------------------------------------------------------------------


def test_calculate_metrics_math():
    df = pd.DataFrame(
        {
            "return": [0.01, -0.02, 0.03],
            "portfolio_value": [101.0, 99.0, 102.0],
            "turnover": [0.1, 0.0, 0.2],
        }
    )
    m = calculate_metrics(df)
    rets = np.array([0.01, -0.02, 0.03])
    assert np.isclose(
        m["Sharpe Ratio"], np.sqrt(252) * rets.mean() / (rets.std() + 1e-8)
    )
    cum = np.cumprod(1 + rets)
    peak = np.maximum.accumulate(cum)
    assert np.isclose(m["Max Drawdown"], np.min((cum - peak) / peak))
    assert np.isclose(m["Avg Turnover"], 0.1)
    assert np.isclose(m["Final Value"], 102.0)
    assert np.isclose(m["Total Return"], 102.0 / 101.0 - 1.0)


def test_calculate_metrics_empty():
    assert calculate_metrics(pd.DataFrame()) == {}


# ---------------------------------------------------------------------------
# Markowitz baseline (reference: test_baselines.py)
# ---------------------------------------------------------------------------


def test_markowitz_insufficient_data_holds():
    fd = _mock_finance_data(T=30)
    strat = MarkowitzStrategy(mpc=MPCParams(max_iters=200, gamma=1.0), min_samples=5)
    aux = strat.precompute(fd, horizon=1)
    w = jnp.full((fd.n_assets,), 1.0 / fd.n_assets)
    # Date 0 has a single sample in the window -> hold.
    target, _ = strat.rebalance(aux, jnp.asarray(0), w, None)
    assert np.allclose(np.asarray(target), np.asarray(w))
    # Later dates have enough data -> can move.
    assert bool(aux["has_data"][10])


def test_markowitz_favors_dominant_asset():
    """Deterministic dominant asset attracts weight
    (reference: test_baselines.py:40-60)."""
    drift = np.zeros(4)
    drift[2] = 0.01  # asset 2 strictly dominates
    fd = _mock_finance_data(T=80, seed=3, drift=drift)
    strat = MarkowitzStrategy(mpc=MPCParams(max_iters=3000, gamma=1.0))
    aux = strat.precompute(fd, horizon=1)
    w0 = jnp.full((fd.n_assets,), 0.25)
    t = jnp.asarray(70)
    target, _ = strat.rebalance(aux, t, w0, None)
    target = np.asarray(target)
    assert target[2] == target.max()
    assert target[2] > 0.3


def test_markowitz_rolling_moments_match_numpy():
    fd = _mock_finance_data(T=100, seed=4)
    strat = MarkowitzStrategy(mpc=FAST_MPC, lookback_window=10)
    aux = strat.precompute(fd, horizon=1)
    rets = np.asarray(fd.destandardize_returns(fd.extract_current_returns(fd.test)))
    t = 50
    window = rets[t - 9 : t + 1]
    assert np.allclose(np.asarray(aux["mu"][t]), window.mean(0), atol=1e-6)
    expected_cov = np.cov(window, rowvar=False) + 1e-6 * np.eye(fd.n_assets)
    assert np.allclose(np.asarray(aux["sigma"][t]), expected_cov, atol=1e-6)


# ---------------------------------------------------------------------------
# DMD baseline (reference: baselines.py:109-187)
# ---------------------------------------------------------------------------


def test_dmd_fit_exact_linear_system():
    """DMD recovers an exactly-linear system's operator."""
    rng = np.random.default_rng(5)
    A = 0.9 * np.eye(6) + 0.05 * rng.standard_normal((6, 6))
    x = rng.standard_normal(6)
    xs = [x]
    for _ in range(200):
        xs.append(A @ xs[-1])
    data = jnp.asarray(np.stack(xs), jnp.float32)
    strat = DMDStrategy(mpc=FAST_MPC).fit(data)
    assert np.allclose(np.asarray(strat.K), A, atol=1e-3)


def test_dmd_backtest_runs():
    fd = _mock_finance_data(T=60)
    cfg = BacktestConfig(HORIZON=3)
    strat = DMDStrategy(mpc=FAST_MPC)
    df = run_backtest(strat, fd, cfg)
    assert len(df) > 0
    assert (df["portfolio_value"] > 0).all()


# ---------------------------------------------------------------------------
# Koopman-MPC strategy end-to-end + path consistency
# ---------------------------------------------------------------------------


def _tiny_koopman(fd):
    cfg = get_config("generic")
    cfg.MODEL.TARGET_SIZE = 8
    cfg.MODEL.ENCODER.LAYERS = [16]
    model = make_model(cfg, fd.observation_size)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_koopman_mpc_backtest_runs():
    fd = _mock_finance_data(T=60)
    model, params = _tiny_koopman(fd)
    strat = KoopmanMPCStrategy(model=model, params=params, mpc=FAST_MPC)
    cfg = BacktestConfig(HORIZON=3)
    df = run_backtest(strat, fd, cfg)
    assert len(df) == fd.test.shape[0] - fd.sequence_length - 3
    assert (df["portfolio_value"] > 0).all()
    # Turnover cap respected at every rebalance.
    assert (df["turnover"] <= FAST_MPC.max_turnover + 1e-3).all()


def test_parallel_path_matches_scan_path():
    """Jacobi sweeps converge to the sequential-scan semantics."""
    fd = _mock_finance_data(T=50, seed=7)
    model, params = _tiny_koopman(fd)
    mpc = MPCParams(max_iters=2000, sigma_scale=2.0)
    strat = KoopmanMPCStrategy(model=model, params=params, mpc=mpc)
    cfg = BacktestConfig(HORIZON=3)

    df_scan = run_backtest(strat, fd, cfg)
    df_par = run_backtest_parallel(strat, fd, cfg, num_sweeps=60)

    v1 = np.asarray(df_scan["portfolio_value"])
    v2 = np.asarray(df_par["portfolio_value"])
    assert np.allclose(v1, v2, rtol=1e-4), np.max(np.abs(v1 - v2) / v1)
    assert np.allclose(
        np.asarray(df_scan["turnover"]), np.asarray(df_par["turnover"]), atol=1e-3
    )


def test_parallel_path_fused_kernel_close():
    """The opt-in batch-in-lanes Pallas solver (interpret mode on CPU)
    reproduces the XLA-solver parallel backtest to solver tolerance."""
    fd = _mock_finance_data(T=50, seed=7)
    model, params = _tiny_koopman(fd)
    mpc = MPCParams(max_iters=2000, sigma_scale=2.0)
    cfg = BacktestConfig(HORIZON=3)

    df_xla = run_backtest_parallel(
        KoopmanMPCStrategy(model=model, params=params, mpc=mpc),
        fd, cfg, num_sweeps=12,
    )
    df_fused = run_backtest_parallel(
        KoopmanMPCStrategy(model=model, params=params, mpc=mpc,
                           use_fused_kernel=True),
        fd, cfg, num_sweeps=12,
    )
    v1 = np.asarray(df_xla["portfolio_value"])
    v2 = np.asarray(df_fused["portfolio_value"])
    assert np.allclose(v1, v2, rtol=2e-3), np.max(np.abs(v1 - v2) / v1)


def test_parallel_path_warm_sweeps():
    """Full-budget warm sweeps reproduce cold-sweep accuracy (the warm
    carry is unbiased); reduced-budget warm sweeps stay within loose
    backtest tolerance. Misuse raises."""
    fd = _mock_finance_data(T=50, seed=7)
    model, params = _tiny_koopman(fd)
    mpc = MPCParams(max_iters=2000, sigma_scale=2.0)
    strat = KoopmanMPCStrategy(model=model, params=params, mpc=mpc)
    cfg = BacktestConfig(HORIZON=3)

    df_scan = run_backtest(strat, fd, cfg)
    v_scan = np.asarray(df_scan["portfolio_value"])

    df_warm = run_backtest_parallel(
        strat, fd, cfg, num_sweeps=60, warm_sweeps_iters=2000
    )
    v_warm = np.asarray(df_warm["portfolio_value"])
    assert np.max(np.abs(v_warm - v_scan) / v_scan) < 5e-3

    with pytest.raises(ValueError):
        run_backtest_parallel(
            BuyAndHoldStrategy(), fd, cfg, num_sweeps=12,
            warm_sweeps_iters=100,
        )
    with pytest.raises(ValueError):
        run_backtest_parallel(
            strat, fd, cfg, num_sweeps=1, warm_sweeps_iters=100
        )


def test_parallel_path_buy_and_hold_exact():
    fd = _mock_finance_data(T=50, seed=8)
    cfg = BacktestConfig(HORIZON=3)
    df_scan = run_backtest(BuyAndHoldStrategy(), fd, cfg)
    df_par = run_backtest_parallel(BuyAndHoldStrategy(), fd, cfg, num_sweeps=60)
    assert np.allclose(
        np.asarray(df_scan["portfolio_value"]),
        np.asarray(df_par["portfolio_value"]),
        rtol=1e-4,
    )


def test_full_experiment_four_strategies():
    """All four strategies produce comparable metric dicts
    (reference: run_experiment.py:96-137)."""
    fd = _mock_finance_data(T=50, seed=9)
    model, params = _tiny_koopman(fd)
    cfg = BacktestConfig(HORIZON=3)
    strategies = {
        "BuyAndHold": BuyAndHoldStrategy(),
        "Markowitz": MarkowitzStrategy(mpc=MPCParams(max_iters=300, gamma=1.0)),
        "DMD": DMDStrategy(mpc=FAST_MPC),
        "KoopmanMPC": KoopmanMPCStrategy(model=model, params=params, mpc=FAST_MPC),
    }
    results = {}
    for name, strat in strategies.items():
        df = run_backtest(strat, fd, cfg)
        results[name] = calculate_metrics(df)
    table = pd.DataFrame(results).T
    assert set(table.columns) == {
        "Sharpe Ratio", "Max Drawdown", "Avg Turnover", "Final Value", "Total Return",
    }
    assert np.isfinite(table.values.astype(float)).all()


def test_full_experiment_four_strategies_parallel():
    """Every strategy also runs through the Jacobi parallel path (the
    run_experiment.py --parallel configuration; regression: DMDStrategy
    borrows KoopmanMPCStrategy.rebalance_all, which reads fields only
    the owner class declared)."""
    fd = _mock_finance_data(T=40, seed=10)
    model, params = _tiny_koopman(fd)
    cfg = BacktestConfig(HORIZON=3)
    strategies = {
        "BuyAndHold": BuyAndHoldStrategy(),
        "Markowitz": MarkowitzStrategy(mpc=MPCParams(max_iters=150, gamma=1.0)),
        "DMD": DMDStrategy(mpc=FAST_MPC),
        "KoopmanMPC": KoopmanMPCStrategy(model=model, params=params, mpc=FAST_MPC),
    }
    for name, strat in strategies.items():
        df = run_backtest_parallel(strat, fd, cfg, num_sweeps=3)
        metrics = calculate_metrics(df)
        assert np.isfinite(list(metrics.values())).all(), name

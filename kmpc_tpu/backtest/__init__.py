"""Backtest engine, strategies, and baselines."""

from kmpc_tpu.backtest.engine import (
    BuyAndHoldStrategy,
    DMDStrategy,
    KoopmanMPCStrategy,
    MarkowitzStrategy,
    ScenarioKoopmanMPCStrategy,
    calculate_metrics,
    make_backtester,
    make_parallel_backtester,
    run_backtest,
    run_backtest_parallel,
)

__all__ = [
    "BuyAndHoldStrategy",
    "DMDStrategy",
    "KoopmanMPCStrategy",
    "MarkowitzStrategy",
    "ScenarioKoopmanMPCStrategy",
    "calculate_metrics",
    "make_backtester",
    "make_parallel_backtester",
    "run_backtest",
    "run_backtest_parallel",
]

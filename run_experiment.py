#!/usr/bin/env python
"""Full backtest experiment: Koopman-MPC vs Buy&Hold / Markowitz / DMD.

TPU-native rebuild of the reference experiment CLI
(reference: run_experiment.py:33-174): auto-discovers the latest run,
loads its checkpoint, runs all four strategies over the test split, and
writes the comparison table + equity-curve plot.

Usage:
    python run_experiment.py [--path runs/kae_finance/<ts>] [--parallel]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def find_latest_run(base: Path) -> Path:
    """Latest timestamped run dir containing a checkpoint
    (reference: run_experiment.py:42-65)."""
    candidates = []
    for d in sorted(base.glob("*/")):
        if (d / "checkpoint" / "arrays.npz").exists() or (d / "last" / "arrays.npz").exists():
            candidates.append(d)
    if not candidates:
        raise FileNotFoundError(f"No run with checkpoints under {base}")
    return candidates[-1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, default=None,
                        help="run directory (default: latest under runs/kae_finance)")
    parser.add_argument("--horizon", type=int, default=None,
                        help="default: the run config's MPC.HORIZON")
    parser.add_argument("--cost_coeff", type=float, default=None,
                        help="default: the run config's MPC.COST_COEFF")
    parser.add_argument("--max_turnover", type=float, default=None,
                        help="default: the run config's MPC.MAX_TURNOVER")
    parser.add_argument("--risk_aversion", type=float, default=1.0)
    parser.add_argument("--mpc_iters", type=int, default=None,
                        help="default: the run config's MPC.SOLVER.MAX_ITERS")
    parser.add_argument("--fused", action="store_true",
                        help="route the parallel backtest's batched solves "
                             "through the packed Pallas kernels (log-utility, "
                             "scenario Kelly, and mean-variance)")
    parser.add_argument("--parallel", action="store_true",
                        help="use the Jacobi parallel backtest path")
    parser.add_argument("--scenarios", type=int, default=0,
                        help="also run the stochastic-Kelly strategy with N Monte-Carlo scenarios")
    parser.add_argument("--sweeps", type=int, default=0,
                        help="parallel-path sweeps (0 = number of dates, exact)")
    parser.add_argument("--torch_ckpt", type=str, default=None,
                        help="load a reference PyTorch checkpoint.pt "
                             "(train.py:475-492 format) instead of a "
                             "kmpc_tpu run directory")
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--allow_pickle", action="store_true",
                        help="permit full unpickling of .pt checkpoints that "
                             "fail the safe weights_only load (runs code "
                             "embedded in the file; trusted files only)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import pandas as pd

    from kmpc_tpu.config import BacktestConfig, Config
    from kmpc_tpu.backtest.engine import (
        BuyAndHoldStrategy,
        DMDStrategy,
        KoopmanMPCStrategy,
        MarkowitzStrategy,
        ScenarioKoopmanMPCStrategy,
        calculate_metrics,
        run_backtest,
        run_backtest_parallel,
    )
    from kmpc_tpu.data.finance import load_finance_data
    from kmpc_tpu.models import make_model
    from kmpc_tpu.ops.mpc import MPCParams, mpc_params_from_config
    from kmpc_tpu.utils.checkpoint import load_params_any

    torch_ckpt = args.torch_ckpt
    if torch_ckpt is None and args.path and args.path.endswith(".pt"):
        torch_ckpt = args.path
    if torch_ckpt is not None:
        # Drop-in path for reference users: a torch.save'd checkpoint.pt.
        from kmpc_tpu.utils.torch_import import (
            check_finance_compatibility,
            load_torch_checkpoint,
        )

        print(f"Loading reference torch checkpoint from {torch_ckpt}")
        ckpt = load_torch_checkpoint(torch_ckpt, allow_pickle=args.allow_pickle)
        cfg, model, params = ckpt["config"], ckpt["model"], ckpt["params"]
        fd = load_finance_data(cfg)
        check_finance_compatibility(fd, ckpt)
        run_dir = Path(torch_ckpt).parent
        print(f"Loaded model at step {ckpt['step']}")
    else:
        run_dir = Path(args.path) if args.path else find_latest_run(Path("runs/kae_finance"))
        ckpt_dir = run_dir / "checkpoint"
        if not (ckpt_dir / "arrays.npz").exists():
            ckpt_dir = run_dir / "last"
        print(f"Loading checkpoint from {ckpt_dir}")

        cfg = Config.from_json(str(run_dir / "config.json"))
        if cfg.ENV.ENV_NAME != "finance":
            raise SystemExit(
                f"run_experiment backtests finance runs, but {run_dir} was "
                f"trained on ENV_NAME={cfg.ENV.ENV_NAME!r}; use "
                "evaluate_checkpoints.py for dynamical-system runs"
            )
        fd = load_finance_data(cfg)
        model = make_model(cfg, fd.observation_size)
        params, step, _ = load_params_any(ckpt_dir, cfg, model, seed=cfg.SEED)
        print(f"Loaded model at step {step}")

    # CLI flags override the run's config.json MPC/BACKTEST sections.
    horizon = args.horizon if args.horizon is not None else cfg.MPC.HORIZON
    cost_coeff = (args.cost_coeff if args.cost_coeff is not None
                  else cfg.MPC.COST_COEFF)
    max_turnover = (args.max_turnover if args.max_turnover is not None
                    else cfg.MPC.MAX_TURNOVER)
    mpc_iters = (args.mpc_iters if args.mpc_iters is not None
                 else cfg.MPC.SOLVER.MAX_ITERS)

    bt_cfg = BacktestConfig(
        INITIAL_CAPITAL=cfg.BACKTEST.INITIAL_CAPITAL,
        HORIZON=horizon,
        REBALANCE_FREQ=cfg.BACKTEST.REBALANCE_FREQ,
        COST_COEFF=cost_coeff,
        ALLOW_SHORT=cfg.BACKTEST.ALLOW_SHORT,
        LOOKBACK_WINDOW=cfg.BACKTEST.LOOKBACK_WINDOW,
    )
    mpc = mpc_params_from_config(
        cfg, horizon=horizon, cost_coeff=cost_coeff,
        max_turnover=max_turnover, max_iters=mpc_iters, sigma_scale=2.0,
    )
    mv_mpc = mpc_params_from_config(
        cfg, horizon=1, gamma=args.risk_aversion, cost_coeff=cost_coeff,
        max_iters=mpc_iters,
    )

    strategies = {
        "BuyAndHold": BuyAndHoldStrategy(),
        "Markowitz": MarkowitzStrategy(
            mpc=mv_mpc, lookback_window=bt_cfg.LOOKBACK_WINDOW,
            use_fused_kernel=args.fused),
        "DMD": DMDStrategy(mpc=mpc, use_fused_kernel=args.fused),
        "KoopmanMPC": KoopmanMPCStrategy(
            model=model, params=params, mpc=mpc,
            use_fused_kernel=args.fused),
    }
    if args.scenarios > 0:
        strategies["ScenarioKelly"] = ScenarioKoopmanMPCStrategy(
            model=model, params=params, mpc=mpc, num_scenarios=args.scenarios,
            use_fused_kernel=args.fused,
        )

    out_dir = Path(args.output) if args.output else run_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    results, curves = {}, {}
    n_dates = fd.test.shape[0] - fd.sequence_length - bt_cfg.HORIZON
    sweeps = args.sweeps if args.sweeps > 0 else n_dates
    for name, strat in strategies.items():
        print(f"Backtesting {name}...")
        if args.parallel:
            df = run_backtest_parallel(strat, fd, bt_cfg, num_sweeps=sweeps)
        else:
            df = run_backtest(strat, fd, bt_cfg)
        results[name] = calculate_metrics(df)
        curves[name] = df

    table = pd.DataFrame(results).T
    print("\n" + table.to_string())
    table.to_csv(out_dir / "full_comparison_metrics.csv")

    # Equity-curve comparison plot (reference: run_experiment.py:139-171).
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(11, 6))
    for name, df in curves.items():
        ax.plot(df["date"], df["portfolio_value"], label=name, lw=1.4)
    ax.set_ylabel("portfolio value")
    ax.set_title("Equity curves: Koopman-MPC vs baselines")
    ax.legend()
    fig.autofmt_xdate()
    fig.tight_layout()
    fig.savefig(out_dir / "equity_curves.png", dpi=150)
    plt.close(fig)

    with open(out_dir / "experiment_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nResults saved to {out_dir}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end walkthrough of the kmpc_tpu framework.

Runs the complete pipeline at demo scale on any backend:
  1. synthetic finance data -> embedding -> splits
  2. Koopman autoencoder training (jitted steps)
  3. multi-mode forecast evaluation
  4. batched MPC solves (deterministic + stochastic Kelly)
  5. 5-strategy backtest + metrics table

Usage:
    python examples/full_pipeline.py [--cpu] [--steps 500]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

# Allow running directly from a repo checkout without installation.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from kmpc_tpu.config import BacktestConfig, get_config
    from kmpc_tpu.backtest import (
        BuyAndHoldStrategy,
        DMDStrategy,
        KoopmanMPCStrategy,
        MarkowitzStrategy,
        ScenarioKoopmanMPCStrategy,
        calculate_metrics,
        run_backtest_parallel,
    )
    from kmpc_tpu.data import load_finance_data
    from kmpc_tpu.models import make_model
    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch
    from kmpc_tpu.train.loop import (
        evaluate_finance,
        init_train_state,
        make_fused_finance_train_steps,
    )

    # ------------------------------------------------------------------ 1
    print("== 1. Data: synthetic price panel -> embedding -> leak-free splits")
    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = 128
    cfg.MODEL.ENCODER.LAYERS = [128, 128]
    cfg.ENV.FINANCE.EMBEDDING_DIM = 8
    cfg.ENV.FINANCE.CACHE_DIR = None
    cfg.TRAIN.BATCH_SIZE = 32
    fd = load_finance_data(cfg)
    print(f"   {fd.n_assets} assets x d={fd.embedding_dim} -> obs {fd.observation_size}; "
          f"train/val/test = {fd.train.shape[0]}/{fd.val.shape[0]}/{fd.test.shape[0]}")

    # ------------------------------------------------------------------ 2
    print(f"== 2. Train GenericKM (z={cfg.MODEL.TARGET_SIZE}) for {args.steps} steps "
          f"(fused multi-step dispatch)")
    model = make_model(cfg, fd.observation_size)
    state = init_train_state(cfg, model, jax.random.PRNGKey(cfg.SEED))
    chunk = max(args.steps // 5, 1)
    fused = make_fused_finance_train_steps(cfg, model, chunk)
    key = jax.random.PRNGKey(1)
    step = 0
    while step < args.steps:
        state, metrics = fused(state, key, step, fd.train)
        step += chunk
        print(f"   step {step}: loss {float(metrics['loss']):.3f}")
    params = state["params"]

    # ------------------------------------------------------------------ 3
    print("== 3. Multi-mode forecast evaluation")
    init, future = fd.get_test_sequences(num_sequences=50, max_length=50)
    ev = evaluate_finance(model, params, init, future, max_horizon=50)
    for mode, mse in sorted(ev["mean_mses"].items()):
        print(f"   {mode:<14} MSE {mse:.4f}")

    # ------------------------------------------------------------------ 4
    print("== 4. Batched MPC: 1024 problems in one jitted solve")
    rng = np.random.default_rng(0)
    B, H, N = 1024, 5, fd.n_assets
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    w, info = solve_mpc_log_utility_batch(cw, ys, MPCParams(max_iters=1000))
    print(f"   weights {w.shape}, all feasible: "
          f"sum err {float(jnp.max(jnp.abs(jnp.sum(w, -1) - 1))):.1e}, "
          f"converged {float(jnp.mean(info['converged'])):.0%}")

    # ------------------------------------------------------------------ 5
    print("== 5. 5-strategy backtest over the full test split (parallel path)")
    mpc = MPCParams(max_iters=1000)
    strategies = {
        "BuyAndHold": BuyAndHoldStrategy(),
        "Markowitz": MarkowitzStrategy(mpc=MPCParams(max_iters=1000, gamma=1.0)),
        "DMD": DMDStrategy(mpc=mpc),
        "KoopmanMPC": KoopmanMPCStrategy(model=model, params=params, mpc=mpc),
        "ScenarioKelly": ScenarioKoopmanMPCStrategy(
            model=model, params=params, mpc=mpc, num_scenarios=8),
    }
    bt = BacktestConfig(HORIZON=5)
    results = {}
    for name, strat in strategies.items():
        df = run_backtest_parallel(strat, fd, bt, num_sweeps=20)
        results[name] = calculate_metrics(df)
    print(pd.DataFrame(results).T.to_string())


if __name__ == "__main__":
    main()

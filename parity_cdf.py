#!/usr/bin/env python
"""Measured weight-parity CDF: batched PDHG vs the interior-point oracle.

Quantifies the BASELINE.md:25 north star ("weight-trajectory parity
<= 1e-4 vs reference at same horizon") as a measured distribution
instead of an assertion. Instances:

- RANDOM: cw ~ Dirichlet(1), y ~ 0.01 N(0,1) + 5e-4 (the bench
  instance family, H=5, N=30).
- REALISTIC: per-date Koopman H-step forecasts on the synthetic
  finance test split (a briefly-trained GenericKM, the same
  predict_returns path the backtest engine uses) paired with
  realistically drifted pre-trade weights from a Koopman-MPC backtest.
  Uses the panel's native 20 assets (the reference default universe,
  reference: config.py:135-146).

Both sides solve the SAME program: the PDHG solver with the ridge
tie-breaker (MPCParams.ridge) and the trust-constr oracle with the
matching ridge term (ops/mpc_oracle.py). On the program's near-flat
optimal faces the ridge makes the optimum unique, so weight-level
disagreement measures solver error, not tie-breaking (reference
program: mpc.py:27-117 — no ridge; objective-level parity is reported
for ridge=0 too).

Metric: max-abs error of the FIRST weight row (the row a backtest
applies, reference: backtest.py:124-131) per instance; the CDF and the
fraction <= 1e-4 go to parity_cdf.json and RESULTS.md.

Usage:
    python parity_cdf.py --n_random 1000 --n_realistic 1000 \
        --ridge 1e-3 --iters 1000 30000 --out parity_cdf.json
"""

from __future__ import annotations

import argparse
import json
from concurrent.futures import ProcessPoolExecutor

import numpy as np

H, N = 5, 30


def make_random_instances(n, seed=0):
    rng = np.random.default_rng(seed)
    cw = rng.dirichlet(np.ones(N), size=n).astype(np.float32)
    ys = (rng.standard_normal((n, H, N)) * 0.01 + 5e-4).astype(np.float32)
    return cw, ys


def make_realistic_instances(n, seed=0, train_steps=300):
    """Koopman-forecast returns + drifted pre-trade weights from an
    actual backtest run — the instance distribution the MPC solver sees
    in production."""
    import jax
    import jax.numpy as jnp

    from kmpc_tpu.backtest.engine import (
        BacktestConfig,
        KoopmanMPCStrategy,
        run_backtest,
    )
    from kmpc_tpu.config import get_config
    from kmpc_tpu.data.finance import load_finance_data
    from kmpc_tpu.models import make_model
    from kmpc_tpu.ops.mpc import MPCParams
    from kmpc_tpu.ops.rollout import predict_returns
    from kmpc_tpu.train.loop import init_train_state, make_train_step

    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = 128          # small model: forecasts, not SOTA
    cfg.TRAIN.BATCH_SIZE = 32
    fd = load_finance_data(cfg)
    n_assets = fd.n_assets               # native 20-asset universe
    model = make_model(cfg, fd.observation_size)

    key = jax.random.PRNGKey(seed)
    init_key, data_key = jax.random.split(key)
    state = init_train_state(cfg, model, init_key)
    step_fn = make_train_step(cfg, model, dt=1.0)
    L = cfg.TRAIN.SEQUENCE_LENGTH if cfg.TRAIN.USE_SEQUENCE_LOSS else 1
    for step in range(train_steps):
        bkey = jax.random.fold_in(data_key, step)
        win = fd.sample_batch(bkey, "train", cfg.TRAIN.BATCH_SIZE, L)
        batch = win if cfg.TRAIN.USE_SEQUENCE_LOSS else (win[:, 0], win[:, 1])
        state, _ = step_fn(state, batch)
    params = state["params"]

    preds = predict_returns(model, params, fd.test, H, fd.n_assets,
                            fd.mean, fd.std)                  # [T, H, n]
    bt_cfg = BacktestConfig(HORIZON=H)
    strat = KoopmanMPCStrategy(
        model=model, params=params,
        mpc=MPCParams(max_iters=1000, sigma_scale=2.0,
                      proj_refresh_every=16),
    )
    hist = run_backtest(strat, fd, bt_cfg, return_dataframe=False)
    targets = np.asarray(hist["weights"])                       # [T, N]
    rets = np.asarray(
        fd.destandardize_returns(fd.extract_current_returns(fd.test))
    )
    T = targets.shape[0]
    # Pre-trade weights for date t = date t-1's target drifted by the
    # realized return (reference: backtest.py:202-208).
    cw = np.empty((T, n_assets), np.float32)
    cw[0] = 1.0 / n_assets
    simple = np.expm1(rets[1 : T + 1] if rets.shape[0] > T else rets[:T])
    for t in range(1, T):
        gross = targets[t - 1] * (1.0 + simple[t - 1])
        cw[t] = gross / max(gross.sum(), 1e-12)
    ys = np.asarray(preds)[:T].astype(np.float32)
    if T >= n:
        idx = np.linspace(0, T - 1, n).astype(int)
    else:
        idx = np.arange(T)
    return cw[idx], ys[idx]


def _oracle_one(args):
    cw, y, ridge = args
    from kmpc_tpu.ops.mpc_oracle import solve_mpc_log_utility_oracle

    w, info = solve_mpc_log_utility_oracle(
        np.asarray(cw, np.float64), np.asarray(y, np.float64), ridge=ridge
    )
    return w, info["status"] == "optimal"


def solve_oracle(cw, ys, ridge, workers=2):
    """Full [n, H, N] oracle solutions + per-instance optimal flags."""
    jobs = [(cw[i], ys[i], ridge) for i in range(cw.shape[0])]
    with ProcessPoolExecutor(max_workers=workers) as pool:
        out = list(pool.map(_oracle_one, jobs, chunksize=8))
    w = np.stack([o[0] for o in out])
    ok = np.asarray([o[1] for o in out])
    return w, ok


def ridged_objective(w, ys, cw, ridge, cost_coeff=0.001):
    """Min-form ridged objective, float64, per instance [n]."""
    w = np.asarray(w, np.float64)
    r = np.exp(np.asarray(ys, np.float64))
    port = np.maximum((w * r).sum(-1), 1e-300)
    prev = np.concatenate([np.asarray(cw, np.float64)[:, None], w[:, :-1]], 1)
    u = w - prev
    return (
        -np.log(port).sum(-1)
        + cost_coeff * np.abs(u).sum((-2, -1))
        + 0.5 * ridge * (w * w).sum((-2, -1))
    )


def solve_pdhg(cw, ys, ridge, iters, polish=False, cycles=3):
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch

    params = MPCParams(max_iters=iters, sigma_scale=2.0, ridge=ridge,
                       polish=polish, polish_newton=4)
    cwj = jnp.asarray(cw)
    ysj = jnp.asarray(ys)
    if polish:
        from kmpc_tpu.ops.mpc_polish import (
            solve_mpc_log_utility_batch_polished,
        )

        w, info = solve_mpc_log_utility_batch_polished(
            cwj, ysj, params, cycles=cycles
        )
        return np.asarray(w), np.asarray(info["residual_after"])
    w, info = solve_mpc_log_utility_batch(cwj, ysj, params)
    return np.asarray(w), np.asarray(info["converged"])


def cdf_stats(err):
    err = np.asarray(err)
    q = lambda p: float(np.quantile(err, p))  # noqa: E731
    return {
        "n": int(err.size),
        "median": q(0.5),
        "p90": q(0.9),
        "p99": q(0.99),
        "max": float(err.max()),
        "frac_le_1e-4": float(np.mean(err <= 1e-4)),
        "frac_le_1e-3": float(np.mean(err <= 1e-3)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_random", type=int, default=1000)
    ap.add_argument("--n_realistic", type=int, default=1000)
    ap.add_argument("--ridge", type=float, default=1e-3)
    ap.add_argument("--iters", type=int, nargs="*", default=[1000, 30000])
    ap.add_argument("--polish", action="store_true",
                    help="also report the POLISH=True verification path "
                         "at the highest iteration budget")
    ap.add_argument("--polish_cycles", type=int, default=3,
                    help="PDHG<->Newton alternation cycles for the "
                         "verified path")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--out", type=str, default="parity_cdf.json")
    ap.add_argument("--train_steps", type=int, default=300)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")

    families = {}
    if args.n_random:
        families["random"] = make_random_instances(args.n_random)
    if args.n_realistic:
        families["realistic"] = make_realistic_instances(
            args.n_realistic, train_steps=args.train_steps
        )

    results = {"ridge": args.ridge, "H": H, "N": N, "families": {}}
    for name, (cw, ys) in families.items():
        fam = {"n": int(cw.shape[0]), "settings": {}}
        print(f"[{name}] {cw.shape[0]} instances: oracle (ridge="
              f"{args.ridge})...", flush=True)
        w_or, ok = solve_oracle(cw, ys, args.ridge, workers=args.workers)
        fam["oracle_optimal_frac"] = float(ok.mean())
        obj_or = ridged_objective(w_or, ys, cw, args.ridge)
        for iters in args.iters:
            w_pd, conv = solve_pdhg(cw, ys, args.ridge, iters)
            err = np.max(np.abs(w_pd[:, 0, :] - w_or[:, 0, :]), axis=-1)
            # Objective gap (min-form; > 0 = worse than the oracle). This
            # is the quantity a backtest consumes — weight error on flat
            # faces overstates the economic difference by orders of
            # magnitude.
            gap = ridged_objective(w_pd, ys, cw, args.ridge) - obj_or
            fam["settings"][f"pdhg_{iters}"] = {
                **cdf_stats(err),
                "converged_frac": float(np.asarray(conv, float).mean()),
                "objective_gap_median": float(np.median(gap)),
                "objective_gap_p99": float(np.quantile(gap, 0.99)),
                "objective_gap_max": float(gap.max()),
            }
            print(f"[{name}] pdhg@{iters}: "
                  f"{fam['settings'][f'pdhg_{iters}']}", flush=True)
        if args.polish:
            iters = max(args.iters)
            w_pp, res_after = solve_pdhg(cw, ys, args.ridge, iters,
                                         polish=True,
                                         cycles=args.polish_cycles)
            err = np.max(np.abs(w_pp[:, 0, :] - w_or[:, 0, :]), axis=-1)
            obj_pp = ridged_objective(w_pp, ys, cw, args.ridge)
            dom = obj_pp - obj_or          # < 0: we beat the oracle
            fam["settings"][f"pdhg_{iters}_polished"] = {
                **cdf_stats(err),
                "kkt_certified_frac": float(np.mean(res_after < 1e-10)),
                "residual_after_max": float(res_after.max()),
                "objective_leq_oracle_frac": float(np.mean(dom <= 1e-12)),
                "objective_margin_median": float(np.median(dom)),
                "objective_margin_max": float(dom.max()),
            }
            print(f"[{name}] pdhg@{iters}+polish: "
                  f"{fam['settings'][f'pdhg_{iters}_polished']}", flush=True)
        results["families"][name] = fam

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

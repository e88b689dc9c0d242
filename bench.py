"""Benchmark harness: batched MPC solve throughput on the local chip.

Default mode prints ONE JSON line (the driver contract):
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: horizon-5, 30-asset log-utility MPC solves/s/chip (the
BASELINE.md build target; the reference solves these one at a time with
CVXPY/ECOS on CPU at O(10-100 ms) each — reference: backtest.py:173-175,
mpc.py:108). Target: 10,000 solves/s/chip (BASELINE.json).

``--mode`` selects additional BASELINE.json workload configs:
    mpc       H=5 / 30 assets log-utility (default, headline)
    long      H=20 / d=10-style long-horizon MPC
    scenario  4096 dates x Monte-Carlo paths, scenario-averaged Kelly
    assets500 500-asset universe (sweep/Markowitz scale)
    markowitz mean-variance QP, H=1 per-date rolling Sigma (baseline's program)
    backtest  parallel Jacobi backtest, dates/s
    scaling   SPMD partitioning proxy on a virtual 8-device CPU mesh
    train     finance_sparse training step throughput

Timing is synchronized by fetching a scalar checksum to the host —
block_until_ready alone does not synchronize through this platform's
remote-execution relay.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timed(solve, make_inputs, reps):
    import jax.numpy as jnp

    inputs = make_inputs(0)
    out = solve(*inputs)
    float(out[-1])  # warm-up compile + full sync via checksum fetch

    times = []
    last = out
    for rep in range(reps):
        inputs = make_inputs(rep + 1)
        float(jnp.sum(inputs[0]))  # materialize inputs on device
        t0 = time.perf_counter()
        last = solve(*inputs)
        float(last[-1])
        times.append(time.perf_counter() - t0)
    return min(times), last


def bench_mpc(batch, iters, reps, H=5, N=30, solver_name="packed",
              adaptive=False):
    import jax
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    # feas_tol reflects the achievable turnover-cap slack at this
    # iteration budget (~1e-4 at 1000 iters). proj_refresh_every=16:
    # one warm Michelot sweep per PDHG iteration with a full refresh
    # every 16th (+9-23% across workloads; ~5e-5 weight-parity tail,
    # objective unchanged — see RESULTS.md).
    params = MPCParams(max_iters=iters, sigma_scale=2.0, feas_tol=2e-4,
                       proj_refresh_every=0 if adaptive else 16,
                       adaptive=adaptive)
    solver = {
        "xla": solve_mpc_log_utility_batch,          # pure XLA scan
        "packed": solve_mpc_log_utility_pallas_packed,  # batch-in-lanes kernel
    }[solver_name]

    @jax.jit
    def solve(cw, ys):
        w, info = solver(cw, ys, params)
        return info["converged"], jnp.sum(w)

    def make_problems(seed):
        r = np.random.default_rng(seed)
        cw = jnp.asarray(r.dirichlet(np.ones(N), size=batch), jnp.float32)
        ys = jnp.asarray(r.standard_normal((batch, H, N)) * 0.01 + 0.0005, jnp.float32)
        return cw, ys

    best, (conv, _) = _timed(solve, make_problems, reps)
    return {
        "value": batch / best,
        "batch": batch,
        "H": H,
        "N": N,
        "pdhg_iters": iters,
        "best_batch_time_s": round(best, 4),
        "converged_frac": float(np.mean(np.asarray(conv))),
        "solver": {"xla": "xla_scan",
                   "packed": "pallas_batch_in_lanes"}[solver_name],
    }


def bench_scenario(batch, iters, reps, S=16, H=5, N=30):
    import jax
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_scenarios_packed

    params = MPCParams(max_iters=iters, sigma_scale=2.0,
                       proj_refresh_every=16)

    @jax.jit
    def solve(cw, scen):
        w, info = solve_mpc_log_utility_scenarios_packed(cw, scen, params)
        return jnp.sum(w)

    def make_problems(seed):
        r = np.random.default_rng(seed)
        cw = jnp.asarray(r.dirichlet(np.ones(N), size=batch), jnp.float32)
        scen = jnp.asarray(
            r.standard_normal((batch, S, H, N)) * 0.01, jnp.float32
        )
        return cw, scen

    best, _ = _timed(lambda a, b: (solve(a, b),), make_problems, reps)
    return {
        "value": batch / best,
        "batch": batch,
        "scenarios": S,
        "H": H,
        "N": N,
        "pdhg_iters": iters,
        "best_batch_time_s": round(best, 4),
    }


def bench_markowitz(batch, iters, reps, H=1, N=30):
    """Mean-variance (Markowitz) solve throughput on the packed Pallas
    kernel: the rolling-window baseline's per-date program (reference:
    baselines.py:24-106 -> mpc.py:119-184), with per-problem covariance
    blocks resident in VMEM."""
    import jax
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_mean_variance_pallas_packed

    params = MPCParams(max_iters=iters, sigma_scale=2.0, gamma=5.0,
                       proj_refresh_every=16)

    @jax.jit
    def solve(cw, mu, sig):
        w, info = solve_mpc_mean_variance_pallas_packed(cw, mu, sig, params)
        return info["converged"], jnp.sum(w)

    def make_problems(seed):
        r = np.random.default_rng(seed)
        cw = jnp.asarray(r.dirichlet(np.ones(N), size=batch), jnp.float32)
        mu = jnp.asarray(r.standard_normal((batch, H, N)) * 0.01, jnp.float32)
        A = r.standard_normal((batch, N, N)) * 0.01
        sig = jnp.asarray(
            np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4, jnp.float32
        )
        return cw, mu, sig

    best, (conv, _) = _timed(solve, make_problems, reps)
    return {
        "value": batch / best,
        "batch": batch,
        "H": H,
        "N": N,
        "pdhg_iters": iters,
        "best_batch_time_s": round(best, 4),
        "converged_frac": float(np.mean(np.asarray(conv))),
        "solver": "pallas_batch_in_lanes_mv",
    }


def bench_backtest(reps, n_dates=4096, n_assets=30, sweeps=8):
    """Parallel (Jacobi) backtest throughput over a large synthetic panel:
    rebalance dates processed per second, all MPCs batch-solved per sweep
    (BASELINE config: 'Batched scenario MPC: 4096 rolling-window dates')."""
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from kmpc_tpu.config import BacktestConfig, get_config
    from kmpc_tpu.backtest.engine import KoopmanMPCStrategy, make_parallel_backtester
    from kmpc_tpu.data.finance import (
        FinanceData, FinanceStats, time_delay_embedding,
    )
    from kmpc_tpu.models import make_model
    from kmpc_tpu.ops.mpc import MPCParams

    rng = np.random.default_rng(0)
    d = 4
    T = n_dates + 16
    rets = (rng.standard_normal((T, n_assets)) * 0.01).astype(np.float32)
    mean = rets.mean(0); std = np.maximum(rets.std(0), 1e-8)
    emb = time_delay_embedding((rets - mean) / std, d)
    dates = pd.bdate_range("2005-01-03", periods=len(emb))
    stats = FinanceStats(mean=mean, std=std, tickers=[f"A{i}" for i in range(n_assets)])
    meta = {"n_assets": n_assets, "embedding_dim": d, "observation_size": d * n_assets}
    third = len(emb) // 3
    fd = FinanceData(
        train=jnp.asarray(emb[:third]), val=jnp.asarray(emb[third:2*third]),
        test=jnp.asarray(emb), train_dates=dates[:third],
        val_dates=dates[third:2*third], test_dates=dates, stats=stats,
        metadata=meta, mean=jnp.asarray(mean), std=jnp.asarray(std),
        sequence_length=1,
    )
    cfg = get_config("generic")
    cfg.MODEL.TARGET_SIZE = 64
    cfg.MODEL.ENCODER.LAYERS = [128]
    model = make_model(cfg, fd.observation_size)
    params = model.init(jax.random.PRNGKey(0))
    strat = KoopmanMPCStrategy(
        model=model, params=params,
        mpc=MPCParams(max_iters=500, sigma_scale=2.0,
                      proj_refresh_every=16),
        use_fused_kernel=True,
    )
    bt = BacktestConfig(HORIZON=5)

    run, ts = make_parallel_backtester(strat, fd, bt, num_sweeps=sweeps)
    hist = run()  # warm-up compile
    float(np.sum(np.asarray(hist["portfolio_value"])))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        hist = run()
        float(np.sum(np.asarray(hist["portfolio_value"])))
        times.append(time.perf_counter() - t0)
    best = min(times)
    n = len(ts)
    return {
        "value": n / best,
        "dates": n,
        "sweeps": sweeps,
        "mpc_solves_per_run": n * sweeps,
        "best_run_time_s": round(best, 3),
    }


def bench_scaling(batch, iters, reps, n_devices=8):
    """SPMD partitioning-overhead check on a virtual CPU mesh.

    One physical machine hosts ``n_devices`` virtual XLA devices, so a
    (data, scenario)-sharded solve does the SAME total work on the SAME
    cores as the unsharded solve; wall-clock parity therefore means the
    mesh partitioning + scatter/gather add ~zero overhead, which is the
    single-host proxy available for the >=80%-scaling-efficiency target
    (real ICI scaling needs a pod; see kmpc_tpu/parallel/distributed.py).
    Must be invoked before any other mode touches the TPU backend.
    """
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch
    from kmpc_tpu.parallel.mesh import make_mesh, sharded_mpc_solver

    H, N = 5, 30
    params = MPCParams(max_iters=iters, sigma_scale=2.0)
    rng = np.random.default_rng(0)
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=batch), jnp.float32)
    ys = jnp.asarray(
        rng.standard_normal((batch, H, N)) * 0.01 + 0.0005, jnp.float32
    )

    def time_solve(solve):
        w, info = solve(cw, ys)
        float(jnp.sum(w))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            w, _ = solve(cw, ys)
            float(jnp.sum(w))
            times.append(time.perf_counter() - t0)
        return min(times)

    single = jax.jit(
        lambda a, b: solve_mpc_log_utility_batch(a, b, params)
    )
    t1 = time_solve(single)

    data_ax = 2 if n_devices >= 2 else 1
    mesh = make_mesh(
        {"data": data_ax, "scenario": n_devices // data_ax, "model": 1}
    )
    t8 = time_solve(sharded_mpc_solver(mesh, params))

    return {
        "value": t1 / t8,  # >= ~1.0 == no partitioning overhead
        "unsharded_time_s": round(t1, 4),
        "sharded_time_s": round(t8, 4),
        "n_virtual_devices": n_devices,
        "mesh": "data=%d,scenario=%d,model=1" % (
            data_ax, n_devices // data_ax
        ),
        "batch": batch,
        "pdhg_iters": iters,
        "note": "virtual CPU mesh: same cores do the work either way; "
                "ratio ~1.0 means SPMD partitioning adds no overhead",
    }


def bench_train(reps, fused_steps=50, dtype="float32"):
    """finance_sparse training throughput: single-dispatch step (bounded
    by the ~30 ms relay latency here) and the fused multi-step program
    (STEPS_PER_DISPATCH; amortizes dispatch latency, identical numerics
    — tests/test_train.py proves bit-parity). ``dtype='bfloat16'`` runs
    the TPU mixed-precision mode (cfg.TRAIN.DTYPE)."""
    import jax
    import jax.numpy as jnp

    from kmpc_tpu.config import get_config
    from kmpc_tpu.models import make_model
    from kmpc_tpu.train.loop import (
        init_train_state,
        make_fused_finance_train_steps,
        make_train_step,
    )

    cfg = get_config("finance_sparse")
    cfg.TRAIN.DTYPE = dtype
    obs = len(cfg.ENV.FINANCE.TICKERS) * cfg.ENV.FINANCE.EMBEDDING_DIM  # 400
    model = make_model(cfg, obs)
    B, T = cfg.TRAIN.BATCH_SIZE, cfg.TRAIN.SEQUENCE_LENGTH

    # Single-dispatch step.
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, dt=1.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T + 1, obs), jnp.float32)
    state, metrics = step(state, x)
    float(metrics["loss"])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = step(state, x)
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    best_single = min(times)

    # Fused multi-step program (synthetic standardized "returns" panel).
    data = jax.random.normal(jax.random.PRNGKey(2), (4096, obs), jnp.float32)
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))
    fused = make_fused_finance_train_steps(cfg, model, fused_steps)
    state, metrics = fused(state, jax.random.PRNGKey(3), 0, data)
    float(metrics["loss"])
    times = []
    start = fused_steps
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = fused(state, jax.random.PRNGKey(3), start, data)
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
        start += fused_steps
    best_fused = min(times) / fused_steps

    return {
        "value": 1.0 / best_fused,
        "unit_note": "train steps/s (finance_sparse: B=64, obs=400, z=1024, "
                     f"T=10; fused {fused_steps} steps/dispatch)",
        "dtype": dtype,
        "best_fused_step_time_s": round(best_fused, 5),
        "single_dispatch_steps_per_s": round(1.0 / best_single, 1),
        "best_single_step_time_s": round(best_single, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", type=str, default="mpc",
                    choices=["mpc", "long", "scenario", "assets500", "train",
                             "backtest", "scaling", "markowitz"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU devices for --mode scaling")
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype for --mode train "
                         "(bfloat16 = TPU mixed precision)")
    ap.add_argument("--adaptive", action="store_true",
                    help="residual-balancing adaptive step sizes for "
                         "--mode mpc (~6x fewer iterations at matched "
                         "objective accuracy; see RESULTS.md)")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    baseline = 10_000.0  # BASELINE.json target: >=10k solves/s/chip

    if args.quick:
        args.batch = min(args.batch or 512, 512)
        args.iters = min(args.iters, 200)
        args.reps = 2

    if args.mode == "mpc":
        res = bench_mpc(args.batch or 8192, args.iters, args.reps,
                        adaptive=args.adaptive)
        metric = "mpc_log_utility_solves_per_s_per_chip_H5_N30"
        if args.adaptive:
            metric += "_adaptive"
    elif args.mode == "long":
        res = bench_mpc(args.batch or 4096, args.iters, args.reps, H=20, N=30)
        metric = "mpc_log_utility_solves_per_s_per_chip_H20_N30"
    elif args.mode == "assets500":
        # All regimes now use the batch-in-lanes VMEM-resident kernel
        # (1.5x the XLA scan at the headline, 1.7x the assets-in-lanes
        # kernel at N=500 — see ops/mpc_pallas.py docstring).
        res = bench_mpc(args.batch or 1024, args.iters, args.reps, H=5,
                        N=500)
        metric = "mpc_log_utility_solves_per_s_per_chip_H5_N500"
    elif args.mode == "scenario":
        res = bench_scenario(args.batch or 4096, args.iters, args.reps)
        metric = "scenario_kelly_solves_per_s_per_chip_S16_H5_N30"
    elif args.mode == "backtest":
        res = bench_backtest(args.reps)
        metric = "parallel_backtest_dates_per_s_4096dates_N30_H5"
        # Reference: ~1 sequential ECOS solve per date on CPU, O(10-100ms)
        # each -> O(10-100) dates/s; use 100/s as the generous baseline.
        baseline = 100.0
    elif args.mode == "markowitz":
        res = bench_markowitz(args.batch or 4096, args.iters, args.reps)
        metric = "mean_variance_solves_per_s_per_chip_H1_N30"
    elif args.mode == "scaling":
        res = bench_scaling(args.batch or 4096, args.iters, args.reps,
                            n_devices=args.devices)
        metric = f"spmd_partitioning_efficiency_virtual{args.devices}_cpu_mesh"
        baseline = 0.8  # >=80% scaling-efficiency north star (proxy)
    else:  # train
        res = bench_train(args.reps, dtype=args.dtype)
        metric = "finance_sparse_train_steps_per_s"
        if args.dtype != "float32":
            metric += f"_{args.dtype}"
        baseline = 1.0  # no reference number; report raw

    value = res.pop("value")
    units = {"train": "steps/s", "backtest": "dates/s",
             "scaling": "ratio"}
    out = {
        "metric": metric,
        "value": round(value, 1),
        "unit": units.get(args.mode, "solves/s"),
        "vs_baseline": round(value / baseline, 3),
    }
    out.update(res)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

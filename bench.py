"""Benchmark harness: batched MPC solve throughput on the local chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: horizon-5, 30-asset log-utility MPC solves/s/chip (the BASELINE.md
build target; the reference solves these one at a time with CVXPY/ECOS on
CPU at O(10-100 ms) each — reference: backtest.py:173-175, mpc.py:108).
Baseline target: 10,000 solves/s/chip (BASELINE.json).

The solve is the real thing: fresh random problem data each timing rep,
full PDHG iteration count, results block_until_ready.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_mpc(batch: int, iters: int, reps: int, quick: bool):
    import jax
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch

    H, N = 5, 30
    # feas_tol reflects the achievable turnover-cap slack at this
    # iteration budget (~1e-4 at 1000 iters).
    params = MPCParams(max_iters=iters, sigma_scale=2.0, feas_tol=2e-4)

    @jax.jit
    def solve(cw, ys):
        w, info = solve_mpc_log_utility_batch(cw, ys, params)
        # Scalar checksum: fetching it on the host forces the whole solve
        # to complete (block_until_ready alone does not synchronize
        # through the remote-execution relay on this platform).
        return w, info["converged"], jnp.sum(w)

    rng = np.random.default_rng(0)

    def make_problems(seed):
        r = np.random.default_rng(seed)
        cw = jnp.asarray(r.dirichlet(np.ones(N), size=batch), jnp.float32)
        ys = jnp.asarray(r.standard_normal((batch, H, N)) * 0.01 + 0.0005, jnp.float32)
        return cw, ys

    # Warm-up / compile (checksum fetch forces real execution).
    cw, ys = make_problems(0)
    w, conv, chk = solve(cw, ys)
    float(chk)

    times = []
    for rep in range(reps):
        cw, ys = make_problems(rep + 1)
        float(jnp.sum(cw))  # materialize inputs on device
        t0 = time.perf_counter()
        w, conv, chk = solve(cw, ys)
        float(chk)          # host fetch of the scalar checksum = full sync
        times.append(time.perf_counter() - t0)

    best = min(times)
    solves_per_s = batch / best
    return solves_per_s, best, float(np.mean(np.asarray(conv)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    if args.quick:
        args.batch = min(args.batch, 512)
        args.iters = min(args.iters, 200)
        args.reps = 2

    solves_per_s, best_t, conv_frac = bench_mpc(
        args.batch, args.iters, args.reps, args.quick
    )
    baseline = 10_000.0  # BASELINE.json target: >=10k solves/s/chip
    print(
        json.dumps(
            {
                "metric": "mpc_log_utility_solves_per_s_per_chip_H5_N30",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / baseline, 3),
                "batch": args.batch,
                "pdhg_iters": args.iters,
                "best_batch_time_s": round(best_t, 4),
                "converged_frac": conv_frac,
            }
        )
    )


if __name__ == "__main__":
    main()

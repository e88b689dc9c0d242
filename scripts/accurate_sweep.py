#!/usr/bin/env python
"""Matched-accuracy co-headline sweep: adaptive x over_relax x iters.

Round-2 VERDICT #1(b): the reference-accuracy co-headline (probe
objective gap <= 1e-4) is the adaptive solver; the over-relaxation win
(rho=1.9 ~ 1.86x matched-accuracy throughput on the plain solver) was
never composed onto it. This sweep measures, on the real chip, the
probe objective gap AND throughput for each (adaptive, rho, iters)
combination and prints one JSON line per cell, so the co-headline can
be re-tuned to the fastest setting whose gap stays <= 1e-4.

Usage: python scripts/accurate_sweep.py [--batch 8192] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cells", type=str, default=(
        "1.0:1000,1.0:700,1.9:1000,1.9:700,1.9:500,1.5:700"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _probe_gap, _time_stats, _timed
    from kmpc_tpu.ops.mpc import MPCParams
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    H, N, B = 5, 30, args.batch

    def make_problems(seed):
        r = np.random.default_rng(seed)
        cw = jnp.asarray(r.dirichlet(np.ones(N), size=B), jnp.float32)
        ys = jnp.asarray(
            r.standard_normal((B, H, N)) * 0.01 + 0.0005, jnp.float32
        )
        return cw, ys

    for cell in args.cells.split(","):
        rho_s, it_s = cell.split(":")
        rho, iters = float(rho_s), int(it_s)
        params = MPCParams(max_iters=iters, sigma_scale=2.0,
                           adaptive=True, over_relax=rho)

        @jax.jit
        def solve(cw, ys):
            w, info = solve_mpc_log_utility_pallas_packed(cw, ys, params)
            return info["converged"], jnp.sum(w)

        @jax.jit
        def solve_w(cw, ys):
            return solve_mpc_log_utility_pallas_packed(cw, ys, params)[0]

        t0 = time.perf_counter()
        times, (conv, _) = _timed(solve, make_problems, args.reps)
        stats = _time_stats(times, B)
        gap = _probe_gap(solve_w, H, N)
        out = {
            "rho": rho, "iters": iters,
            "solves_per_s": round(stats["value"], 1),
            "spread_pct": stats["spread_pct"],
            "converged_frac": float(np.mean(np.asarray(conv))),
            "objective_gap_median": gap["objective_gap_median"],
            "objective_gap_p90": gap["objective_gap_p90"],
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

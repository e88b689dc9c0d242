#!/usr/bin/env python
"""Round-5 accuracy lab: diagonal preconditioning (MPCParams.precond)
and warm-budget A/Bs on the bench probe family, CPU XLA solver.

Measures the probe objective gap (vs the cached f64 verified oracle,
bench_probe_cache.json) at a ladder of iteration budgets for solver
settings, so accuracy-per-iteration effects are visible before any chip
time is spent. Throughput is NOT measured here (CPU timings are not the
chip's); the chip A/B happens in bench.py once a setting wins on
accuracy.

Usage: python scripts/precond_lab.py [--iters 500 700 1000 1500]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs="*",
                    default=[500, 700, 1000, 1500])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from bench import _min_objective, _oracle_probe_objectives, \
        _probe_instances
    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch

    H, N = 5, 30
    cw, ys = _probe_instances(H, N)
    oracle = _oracle_probe_objectives(H, N)
    cwj, ysj = jnp.asarray(cw), jnp.asarray(ys)

    settings = [
        ("plain+refresh16", dict(proj_refresh_every=16)),
        ("plain+refresh16+precond", dict(proj_refresh_every=16,
                                         precond=True)),
        ("adaptive k=2", dict(adaptive=True, adapt_every=2)),
        ("adaptive k=2 + precond", dict(adaptive=True, adapt_every=2,
                                        precond=True)),
        ("adaptive k=2 + warm2", dict(adaptive=True, adapt_every=2,
                                      proj_warm_iters=2)),
        ("adaptive k=2 + precond + warm2",
         dict(adaptive=True, adapt_every=2, precond=True,
              proj_warm_iters=2)),
    ]
    print(f"{'setting':36s} " + " ".join(f"@{it:<6d}" for it in args.iters))
    for name, kw in settings:
        row = []
        for iters in args.iters:
            params = MPCParams(max_iters=iters, sigma_scale=2.0,
                               feas_tol=2e-4, **kw)
            w, info = solve_mpc_log_utility_batch(cwj, ysj, params)
            gap = _min_objective(np.asarray(w), ys, cw) - oracle
            row.append(float(np.median(gap)))
        print(f"{name:36s} " + " ".join(f"{g:8.1e}" for g in row),
              flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-5 lab: full verified pipeline (incl. the round-5
extended-precision stage) on the probe's uncertified tail.

Runs solve_mpc_log_utility_batch_polished at the published probe
setting (30k iters, 6 cycles) on selected probe instances — default
[0, 76], the two stragglers of the round-4 n=256 probe — and prints the
final residual_after per instance. PASS = every residual < 1e-10.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
HERE = Path(__file__).resolve().parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--idx", type=int, nargs="*", default=[0, 76])
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--cycles", type=int, default=6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams
    from kmpc_tpu.ops.mpc_polish import solve_mpc_log_utility_batch_polished

    d = np.load(HERE / "cert_probe_instances.npz")
    cw = jnp.asarray(d["cw"][args.idx])
    ys = jnp.asarray(d["ys"][args.idx])
    params = MPCParams(max_iters=args.iters, sigma_scale=2.0, ridge=1e-3,
                       polish=True, polish_newton=4)
    t0 = time.perf_counter()
    w, info = solve_mpc_log_utility_batch_polished(cw, ys, params,
                                                   cycles=args.cycles)
    res = np.asarray(info["residual_after"])
    print(f"wall {time.perf_counter() - t0:.1f}s")
    for k, i in enumerate(args.idx):
        print(f"idx {i}: residual_after {res[k]:.2e}  "
              f"{'CERTIFIED' if res[k] < 1e-10 else 'UNCERTIFIED'}")


if __name__ == "__main__":
    main()

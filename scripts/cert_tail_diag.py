#!/usr/bin/env python
"""Fast iteration harness for the 4 uncertified cert-probe instances.

Loads only the uncertified subset (idx 0, 8, 42, 48 of
cert_probe_instances.npz), runs the verified path, and prints per-date
ball/kappa diagnostics for whatever is still stuck. Use this to iterate
on the boundary-aware dual parameterization (round-3 VERDICT task #1)
without paying the 64-instance probe's wall time.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--idx", type=int, nargs="*", default=[0, 8, 42, 48])
    ap.add_argument("--cycles", type=int, default=6)
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--ridge", type=float, default=1e-3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, _apply_D
    from kmpc_tpu.ops.mpc_polish import solve_mpc_log_utility_batch_polished

    d = np.load(Path(__file__).resolve().parent / "cert_probe_instances.npz")
    cw = d["cw"][args.idx]
    ys = d["ys"][args.idx]
    print(f"{cw.shape[0]} instances (idx {args.idx})", flush=True)

    params = MPCParams(max_iters=args.iters, sigma_scale=2.0,
                       ridge=args.ridge, polish=True, polish_newton=4)
    t0 = time.perf_counter()
    w, info = solve_mpc_log_utility_batch_polished(
        jnp.asarray(cw), jnp.asarray(ys), params, cycles=args.cycles
    )
    wall = time.perf_counter() - t0
    res = np.asarray(info["residual_after"])
    print(f"wall {wall:.1f}s")
    for k, i in enumerate(args.idx):
        print(f"idx {i}: residual_after {res[k]:.3e}")

    # Per-date diagnostics on stuck instances.
    w64 = np.asarray(w, dtype=np.float64)
    p64 = np.asarray(info["dual"], dtype=np.float64)
    tau_to = params.max_turnover
    c = params.cost_coeff
    for k, i in enumerate(args.idx):
        if res[k] < 1e-10:
            continue
        u = np.asarray(_apply_D(jnp.asarray(w64[k]), jnp.asarray(cw[k], dtype=np.float64)))
        l1 = np.abs(u).sum(-1)
        kap = np.maximum(np.abs(p64[k]).max(-1) - c, 0.0)
        print(f"--- idx {i}: per-date l1(u)-tau, kappa_est, max|q|-c")
        for t in range(u.shape[0]):
            print(f"  t={t}: l1-tau={l1[t]-tau_to:+.3e} kappa={kap[t]:.3e} "
                  f"max|q|-c={np.abs(p64[k][t]).max()-c:+.3e}")


if __name__ == "__main__":
    main()

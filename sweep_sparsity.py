#!/usr/bin/env python
"""Sparsity-coefficient sweep CLI (reference: sweep_sparsity.py:9-150).

Unlike the reference (one training subprocess per coefficient), every
coefficient trains SIMULTANEOUSLY as a vmapped axis of one jitted
program — see kmpc_tpu/train/sweep.py.

Usage:
    python sweep_sparsity.py --config generic_sparse --env duffing --num_steps 2000
"""

from __future__ import annotations

import argparse

# Reference sweep grid (sweep_sparsity.py:11).
DEFAULT_COEFFS = [0.0, 1e-4, 5e-4, 1e-3, 5e-3, 0.01, 0.02, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="generic_sparse")
    parser.add_argument("--env", type=str, default="duffing")
    parser.add_argument("--num_steps", type=int, default=2000)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--coefficients", type=float, nargs="*", default=None)
    parser.add_argument("--eval_horizon", type=int, default=100)
    parser.add_argument("--log_dir", type=str, default="./runs/sparsity_sweep")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from kmpc_tpu.config import get_config
    from kmpc_tpu.train.sweep import run_sparsity_sweep

    cfg = get_config(args.config)
    cfg.ENV.ENV_NAME = args.env
    cfg.TRAIN.NUM_STEPS = args.num_steps
    cfg.TRAIN.BATCH_SIZE = args.batch_size

    coeffs = args.coefficients or DEFAULT_COEFFS
    results, run_dir = run_sparsity_sweep(
        cfg, coeffs, log_dir=args.log_dir, eval_horizon=args.eval_horizon
    )
    print(f"Log directory: {run_dir}")
    best = min(
        zip(results["coefficients"], results["no_reencode_mse"]), key=lambda kv: kv[1]
    )
    print(f"Best coefficient: {best[0]} (MSE {best[1]:.4e})")


if __name__ == "__main__":
    main()

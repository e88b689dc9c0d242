#!/usr/bin/env python
"""Training CLI (reference: train.py:1082-1191).

Usage:
    python train.py --config generic_sparse --env duffing --num_steps 20000
    python train.py --config finance_sparse
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description="Train Koopman Autoencoder (TPU-native)")
    parser.add_argument(
        "--config", type=str, default="generic",
        choices=["default", "generic", "generic_sparse", "generic_prediction",
                 "lista", "lista_nonlinear", "finance_sparse"],
    )
    parser.add_argument(
        "--env", type=str, default="duffing",
        choices=["duffing", "pendulum", "lotka_volterra", "lorenz63",
                 "parabolic", "lyapunov", "finance"],
    )
    parser.add_argument("--num_steps", type=int, default=None,
                        help="default: the preset's TRAIN.NUM_STEPS")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="default: the preset's TRAIN.BATCH_SIZE")
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--target_size", type=int, default=None)
    parser.add_argument("--sparsity_coeff", type=float, default=None)
    parser.add_argument("--reconst_coeff", type=float, default=None)
    parser.add_argument("--pred_coeff", type=float, default=None)
    parser.add_argument("--lista_alpha", type=float, default=None)
    parser.add_argument("--pairwise", action="store_true",
                        help="single-step loss instead of sequence loss")
    parser.add_argument("--sequence_length", type=int, default=None)
    parser.add_argument("--log_dir", type=str, default="./runs/kae")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint directory to resume from")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (e.g. for smoke tests)")
    parser.add_argument("--no_final_eval", action="store_true",
                        help="skip the post-training standardized evaluation suite")
    parser.add_argument("--steps_per_dispatch", type=int, default=None,
                        help="fuse K optimizer steps per device dispatch "
                             "(identical numerics; amortizes dispatch latency)")
    parser.add_argument("--dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="model compute dtype (bfloat16 = TPU mixed "
                             "precision: f32 master params, bf16 matmuls/"
                             "activations, f32 accumulation)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from kmpc_tpu.config import get_config
    from kmpc_tpu.train.loop import train

    cfg = get_config(args.config)

    # finance_sparse keeps its own ENV_NAME (reference: train.py:1144-1149).
    if args.config != "finance_sparse":
        cfg.ENV.ENV_NAME = args.env

    if args.num_steps is not None:
        cfg.TRAIN.NUM_STEPS = args.num_steps
    if args.batch_size is not None:
        cfg.TRAIN.BATCH_SIZE = args.batch_size
    cfg.SEED = args.seed
    if args.steps_per_dispatch is not None:
        cfg.TRAIN.STEPS_PER_DISPATCH = args.steps_per_dispatch
    if args.dtype is not None:
        cfg.TRAIN.DTYPE = args.dtype
    if args.lr is not None:
        cfg.TRAIN.LR = args.lr
    if args.target_size is not None:
        cfg.MODEL.TARGET_SIZE = args.target_size
    if args.sparsity_coeff is not None:
        cfg.MODEL.SPARSITY_COEFF = args.sparsity_coeff
    if args.reconst_coeff is not None:
        cfg.MODEL.RECONST_COEFF = args.reconst_coeff
    if args.pred_coeff is not None:
        cfg.MODEL.PRED_COEFF = args.pred_coeff
    if args.lista_alpha is not None:
        cfg.MODEL.ENCODER.LISTA.ALPHA = args.lista_alpha
    if args.pairwise:
        cfg.TRAIN.USE_SEQUENCE_LOSS = False
    if args.sequence_length is not None:
        cfg.TRAIN.SEQUENCE_LENGTH = args.sequence_length

    state, model, run_dir = train(
        cfg, log_dir=args.log_dir, checkpoint_path=args.checkpoint,
        final_eval=not args.no_final_eval,
    )
    print(f"Log directory: {run_dir}")


if __name__ == "__main__":
    main()

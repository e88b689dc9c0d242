"""Training layer: optimizer, jitted steps, loops, eval, checkpoints."""

from kmpc_tpu.train.loop import (
    build_optimizer,
    evaluate_finance,
    evaluate_system,
    init_train_state,
    make_fused_finance_train_steps,
    make_fused_system_train_steps,
    make_system_train_step,
    make_train_step,
    train,
    train_finance,
    train_system,
)

__all__ = [
    "build_optimizer",
    "evaluate_finance",
    "evaluate_system",
    "init_train_state",
    "make_fused_finance_train_steps",
    "make_fused_system_train_steps",
    "make_system_train_step",
    "make_train_step",
    "train",
    "train_finance",
    "train_system",
]

"""Compute ops: projections, rollouts, and the batched MPC solvers."""

from kmpc_tpu.ops.projections import (
    project_box,
    project_hyperplane_sum,
    project_l1_ball,
    project_simplex,
    prox_l1_in_ball,
    soft_threshold,
)
from kmpc_tpu.ops.rollout import (
    predict_returns,
    rollout,
    rollout_every_step_reencode,
    rollout_no_reencode,
    rollout_periodic_reencode,
)
from kmpc_tpu.ops.mpc import (
    MPCParams,
    solve_mpc_log_utility,
    solve_mpc_log_utility_batch,
    solve_mpc_mean_variance,
    solve_mpc_mean_variance_batch,
)

__all__ = [
    "project_box",
    "project_hyperplane_sum",
    "project_l1_ball",
    "project_simplex",
    "prox_l1_in_ball",
    "soft_threshold",
    "predict_returns",
    "rollout",
    "rollout_every_step_reencode",
    "rollout_no_reencode",
    "rollout_periodic_reencode",
    "MPCParams",
    "solve_mpc_log_utility",
    "solve_mpc_log_utility_batch",
    "solve_mpc_mean_variance",
    "solve_mpc_mean_variance_batch",
]

"""Parallelism layer: device mesh, shardings, SPMD program builders."""

from kmpc_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    mesh_from_config,
    param_specs,
    replicate,
    shard_batch,
    shard_params,
    sharded_mpc_solver,
)

__all__ = [
    "make_mesh",
    "make_sharded_train_step",
    "mesh_from_config",
    "param_specs",
    "replicate",
    "shard_batch",
    "shard_params",
    "sharded_mpc_solver",
]

"""Device mesh + sharding layer (no reference counterpart).

The reference is single-device torch (reference: train.py:1032-1079, no
torch.distributed anywhere — SURVEY.md §2). This module introduces the
SPMD execution layer the TPU build needs:

Mesh axes:
    data     — data parallel: shards the training batch; XLA inserts the
               gradient psum over ICI automatically when the loss is
               averaged over a data-sharded batch.
    scenario — the workload's dominant parallel axis: backtest dates and
               Monte-Carlo scenarios for the batched MPC solver.
    model    — tensor parallel: shards the Koopman matrix [z, z] and the
               wide encoder/decoder matmuls over their TARGET_SIZE dim
               (finance preset uses z=1024..2048, config.py:402/450).

Everything is ``jax.jit`` + ``NamedSharding``: shardings are declared on
inputs (params + batch) and XLA's SPMD partitioner propagates them and
inserts the collectives (all-gather / reduce-scatter / psum) over ICI —
the scaling-book recipe, not hand-written NCCL calls.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kmpc_tpu.config import Config
from kmpc_tpu.models.koopman import KoopmanModel


# ---------------------------------------------------------------------------
# Mesh construction
# ---------------------------------------------------------------------------


def make_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'scenario', 'model') mesh.

    ``shape`` maps axis name -> size; missing axes get size 1; a value of
    -1 absorbs all remaining devices. Defaults to all devices on 'data'.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    shape = dict(shape or {})
    sizes = {name: int(shape.get(name, 1)) for name in ("data", "scenario", "model")}
    wild = [k for k, v in sizes.items() if v == -1]
    fixed = int(np.prod([v for v in sizes.values() if v != -1]))
    if wild:
        if len(wild) > 1:
            raise ValueError("Only one axis may be -1")
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes[wild[0]] = n // fixed
    if not shape:
        sizes["data"] = n
    total = sizes["data"] * sizes["scenario"] * sizes["model"]
    if total != n:
        raise ValueError(f"Mesh {sizes} needs {total} devices, have {n}")
    dev_array = np.array(devices).reshape(sizes["data"], sizes["scenario"], sizes["model"])
    return Mesh(dev_array, axis_names=("data", "scenario", "model"))


def mesh_from_config(cfg: Config, devices: Optional[Sequence] = None) -> Mesh:
    return make_mesh(
        {
            "data": cfg.PARALLEL.DATA,
            "scenario": cfg.PARALLEL.SCENARIO,
            "model": cfg.PARALLEL.MODEL,
        },
        devices,
    )


# ---------------------------------------------------------------------------
# Sharding specs
# ---------------------------------------------------------------------------


def param_specs(model: KoopmanModel, params: Dict) -> Dict:
    """PartitionSpec pytree for a parameter pytree.

    Tensor-parallel layout over the 'model' axis:
      kmat [z, z]         -> P(None, 'model')  (column-sharded; z @ K keeps
                             the batch dim replicated, output gathered)
      encoder last w      -> P(None, 'model')  (produces z-sharded latents)
      decoder first w     -> P('model', None)  (consumes z-sharded latents;
                             XLA inserts the psum)
      LISTA We [x, z]     -> P(None, 'model'); S [z, z] -> P(None, 'model')
      dict [z, x]         -> P('model', None)
    Biases and small layers replicate.
    """

    def spec_for(path_keys, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path_keys]
        if "kmat" in keys:
            return P(None, "model")
        if "dict" in keys:
            return P("model", None)
        if "S" in keys:
            return P(None, "model")
        if "We" in keys:
            return P(None, "model")
        if leaf.ndim == 2:
            if "encoder" in keys and keys[-1] == "w":
                # Only the final encoder layer outputs the latent dim.
                idx = [k for k in keys if isinstance(k, int)]
                if idx and idx[0] == _last_layer_index(params, "encoder"):
                    return P(None, "model")
            if "decoder" in keys and keys[-1] == "w":
                idx = [k for k in keys if isinstance(k, int)]
                if idx and idx[0] == 0:
                    return P("model", None)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [spec_for(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def _last_layer_index(params: Dict, which: str) -> int:
    return len(params[which]) - 1


def shard_params(params: Dict, model: KoopmanModel, mesh: Mesh) -> Dict:
    """Place params on the mesh with tensor-parallel shardings (falls back
    to replication for dims not divisible by the model-axis size)."""
    m = mesh.shape["model"]

    def place(spec, leaf):
        ok = True
        for dim, name in enumerate(spec):
            if name == "model" and leaf.shape[dim] % m != 0:
                ok = False
        s = NamedSharding(mesh, spec if ok else P())
        return jax.device_put(leaf, s)

    specs = param_specs(model, params)
    return jax.tree.map(place, specs, params,
                        is_leaf=lambda x: isinstance(x, P))


def shard_batch(batch, mesh: Mesh, axes=("data",)):
    """Shard the leading batch axis across the given mesh axes."""
    def place(x):
        spec = P(axes) if x.shape[0] % int(np.prod([mesh.shape[a] for a in axes])) == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


# ---------------------------------------------------------------------------
# Sharded program builders
# ---------------------------------------------------------------------------


def make_sharded_train_step(cfg: Config, model: KoopmanModel, mesh: Mesh, dt: float = 1.0):
    """Data+tensor-parallel training step.

    The batch is sharded over ('data',) and params over 'model'; jit's
    SPMD partitioner inserts the gradient psum across 'data' (the mean
    over a sharded batch) and the activation collectives across 'model'.
    """
    from kmpc_tpu.train.loop import make_train_step

    step = make_train_step(cfg, model, dt)

    def sharded_step(state, batch):
        batch = shard_batch(batch, mesh, ("data",))
        return step(state, batch)

    return sharded_step


def sharded_mpc_solver(mesh: Mesh, mpc_params, use_fused_kernel: bool = False):
    """Scenario-sharded batched log-utility MPC solve.

    Shards the problem batch across ('data','scenario') so a pod slice
    solves its shard locally; per-problem results need no cross-chip
    reduction (embarrassingly parallel across problems — ICI only moves
    the initial scatter and final gather).

    ``use_fused_kernel`` routes each device's shard through the
    batch-in-lanes Pallas kernel under ``jax.shard_map`` (XLA's SPMD
    partitioner cannot split a custom kernel call, so the per-device
    program is made explicit). Requires the batch to divide evenly by
    mesh.shape['data'] * mesh.shape['scenario'].
    """
    from kmpc_tpu.ops.mpc import solve_mpc_log_utility_batch

    if use_fused_kernel:
        from kmpc_tpu.ops.mpc_pallas import (
            solve_mpc_log_utility_pallas_packed,
        )

        spec = P(("data", "scenario"))

        def local_solve(cw, ys):
            return solve_mpc_log_utility_pallas_packed(cw, ys, mpc_params)

        solve = jax.jit(
            jax.shard_map(
                local_solve,
                mesh=mesh,
                in_specs=(spec, spec),
                out_specs=(spec, {"objective": spec, "converged": spec,
                                  "turnover_violation": spec,
                                  "fixed_point_residual": spec}),
                # pallas_call's out_shape carries no varying-mesh-axes
                # annotation; per-problem outputs are trivially varying
                # on the batch axes only.
                check_vma=False,
            )
        )
    else:

        @jax.jit
        def solve(current_weights, predicted_log_returns):
            return solve_mpc_log_utility_batch(
                current_weights, predicted_log_returns, mpc_params
            )

    def sharded_solve(current_weights, predicted_log_returns):
        cw = shard_batch(current_weights, mesh, ("data", "scenario"))
        ys = shard_batch(predicted_log_returns, mesh, ("data", "scenario"))
        return solve(cw, ys)

    return sharded_solve

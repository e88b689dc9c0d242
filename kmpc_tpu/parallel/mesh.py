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
import jax.numpy as jnp
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


# Info keys common to every solver path (the packed wrappers' contract,
# ops/mpc_pallas.py::_match_packed_info); the sharded wrappers restrict
# the info dict to these so XLA and fused paths return the same pytree
# structure and shard_map out_specs stay program-independent.
_SHARDED_INFO_KEYS = (
    "objective", "converged", "turnover_violation", "fixed_point_residual",
    "status_code",
)


def sharded_mpc_solver(mesh: Mesh, mpc_params, use_fused_kernel: bool = False,
                       program: str = "log"):
    """Scenario-sharded batched MPC solve for the full program surface.

    ``program`` selects the convex program (SURVEY §2 "Scenario/date
    parallel" — all three workload programs shard, not just the raw
    log-utility solver):
        'log'      — deterministic log-utility/Kelly:  (cw [B,N], ys [B,H,N])
        'scenario' — scenario-averaged Kelly:          (cw [B,N], scen [B,S,H,N])
        'mv'       — mean-variance (Markowitz):        (cw [B,N], mu [B,H,N],
                     sigma [B,N,N] per-problem sharded or [N,N] shared
                     replicated)

    Shards the problem batch across ('data','scenario') so a pod slice
    solves its shard locally; per-problem results need no cross-chip
    reduction (embarrassingly parallel across problems — ICI only moves
    the initial scatter and final gather).

    ``use_fused_kernel`` routes each device's shard through the
    batch-in-lanes Pallas kernel under ``jax.shard_map`` (XLA's SPMD
    partitioner cannot split a custom kernel call, so the per-device
    program is made explicit). Requires the batch to divide evenly by
    mesh.shape['data'] * mesh.shape['scenario'].

    Returns ``solve(cw, ys)`` / ``solve(cw, scen)`` / ``solve(cw, mu,
    sigma)`` whose info dict carries the packed-wrapper keys
    (objective, converged, turnover_violation, fixed_point_residual) on
    every path. The mean-variance solvers report no turnover violation
    (the reference MV program has no turnover ball, reference:
    mpc.py:144-171); the key is zero-filled for structural uniformity.
    """
    if program not in ("log", "scenario", "mv"):
        raise ValueError(f"unknown program {program!r}")

    spec = P(("data", "scenario"))
    info_spec = {k: spec for k in _SHARDED_INFO_KEYS}

    def _restrict(w, info):
        out = {}
        for k in _SHARDED_INFO_KEYS:
            if k in info:
                out[k] = info[k]
            else:  # MV: no turnover ball in the reference program
                out[k] = jnp.zeros_like(info["fixed_point_residual"])
        return w, out

    if program == "log":
        if use_fused_kernel:
            from kmpc_tpu.ops.mpc_pallas import (
                solve_mpc_log_utility_pallas_packed as _solver,
            )
        else:
            from kmpc_tpu.ops.mpc import (
                solve_mpc_log_utility_batch as _solver,
            )

        def local_solve(cw, ys):
            return _restrict(*_solver(cw, ys, mpc_params))

    elif program == "scenario":
        if use_fused_kernel:
            from kmpc_tpu.ops.mpc_pallas import (
                solve_mpc_log_utility_scenarios_packed as _solver,
            )
        else:
            from kmpc_tpu.ops.scenario import (
                solve_mpc_log_utility_scenarios as _solver,
            )

        def local_solve(cw, scen):
            return _restrict(*_solver(cw, scen, mpc_params))

    else:  # mv
        if use_fused_kernel:
            from kmpc_tpu.ops.mpc_pallas import (
                solve_mpc_mean_variance_pallas_packed as _solver,
            )
        else:
            from kmpc_tpu.ops.mpc import (
                solve_mpc_mean_variance_batch as _solver,
            )

        def local_solve(cw, mu, sigma):
            return _restrict(*_solver(cw, mu, sigma, mpc_params))

    # Cache one compiled solve per input structure (MV: the covariance
    # may be per-problem [B,N,N] — sharded — or shared [N,N] —
    # replicated; each gets its own shard_map/jit).
    compiled: Dict = {}

    def _build(arg_specs):
        if use_fused_kernel:
            return jax.jit(
                jax.shard_map(
                    local_solve,
                    mesh=mesh,
                    in_specs=arg_specs,
                    out_specs=(spec, info_spec),
                    # pallas_call's out_shape carries no varying-mesh-axes
                    # annotation; per-problem outputs are trivially
                    # varying on the batch axes only.
                    check_vma=False,
                )
            )
        return jax.jit(local_solve)

    def sharded_solve(current_weights, *rest):
        B = current_weights.shape[0]
        args = [shard_batch(current_weights, mesh, ("data", "scenario"))]
        arg_specs = [spec]
        for a in rest:
            batched = a.ndim >= 1 and a.shape[0] == B
            if batched:
                args.append(shard_batch(a, mesh, ("data", "scenario")))
                arg_specs.append(spec)
            else:  # shared covariance: replicate
                args.append(replicate(a, mesh))
                arg_specs.append(P())
        key = tuple(str(s) for s in arg_specs)
        if key not in compiled:
            compiled[key] = _build(tuple(arg_specs))
        return compiled[key](*args)

    return sharded_solve

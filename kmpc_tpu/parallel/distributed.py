"""Multi-host SPMD orchestration (no reference counterpart — the
reference's only process-level parallelism is a sequential subprocess
sweep, reference: sweep_sparsity.py:39-46).

One SPMD program runs on every host of a pod slice:

    from kmpc_tpu.parallel.distributed import initialize_distributed
    initialize_distributed()                  # env-driven or explicit
    mesh = make_global_mesh({"data": -1})     # all chips, ICI+DCN

    # Per-host input feeding: each host materializes only its shard and
    # the global array is assembled from per-host shards:
    batch = host_local_to_global(mesh, P("data"), local_batch)

Collectives stay XLA-inserted (psum over 'data' within a slice rides
ICI; cross-host segments ride DCN) — there is no hand-written
NCCL/MPI layer to configure.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kmpc_tpu.parallel.mesh import make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's multi-host runtime.

    With no arguments, relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Safe to call on a single host: becomes a no-op when there is nothing
    to coordinate.

    ORDERING MATTERS: on a real pod ``jax.distributed.initialize`` must
    run BEFORE anything initializes the local backend, so this function
    inspects only its arguments, ``jax.distributed.is_initialized()``
    (pure client state, no backend), and environment variables — never
    ``jax.process_count()`` / ``jax.devices()``, which would force local
    backend initialization and poison pod startup.
    """
    if jax.distributed.is_initialized():
        return  # already initialized
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # Multi-host pod detection WITHOUT touching the backend: more than
    # one worker hostname (a single entry — e.g. 'localhost' under the
    # axon single-chip plugin — is not a pod).
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    pod_env = (
        len([h for h in hostnames.split(",") if h.strip()]) > 1
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    )
    if explicit is None and num_processes is None and not pod_env:
        return  # single host, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(
    shape: Optional[Dict[str, int]] = None,
) -> Mesh:
    """Mesh over ALL devices of all processes (jax.devices() is global)."""
    return make_mesh(shape, jax.devices())


def host_local_to_global(
    mesh: Mesh, spec: P, local_array: np.ndarray
) -> jax.Array:
    """Assemble a globally-sharded array from this host's shard.

    ``local_array`` is this process's slice along the sharded leading
    axis; the global shape is inferred (local rows x process_count along
    that axis). Single-process: equivalent to a plain device_put.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    global_shape = (
        local_array.shape[0] * jax.process_count(),
        *local_array.shape[1:],
    )
    return jax.make_array_from_process_local_data(
        sharding, local_array, global_shape
    )


def process_local_batch_size(global_batch: int) -> int:
    """Rows this host should materialize for a data-sharded batch."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n


def scaling_report(solves_per_s: float, num_chips: int, per_chip_baseline: float) -> Dict:
    """Scaling-efficiency summary for the BASELINE target
    (>=80% solves/s efficiency at 1 chip / 1 host / N hosts)."""
    ideal = per_chip_baseline * num_chips
    return {
        "num_chips": num_chips,
        "solves_per_s": solves_per_s,
        "ideal_solves_per_s": ideal,
        "scaling_efficiency": solves_per_s / ideal if ideal > 0 else float("nan"),
    }

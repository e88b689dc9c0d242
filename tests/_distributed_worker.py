"""Worker for the two-process distributed test (tests/test_distributed.py).

Run as: python _distributed_worker.py <rank> <coordinator>

Each of the two processes hosts 4 virtual CPU devices (8 global). The
worker exercises the REAL multi-process branches that single-process
tests cannot reach: jax.distributed.initialize via
initialize_distributed's env/arg path, make_global_mesh over devices of
both processes, host_local_to_global's
make_array_from_process_local_data branch, a cross-process reduction,
and one data-parallel train step on a globally-sharded batch whose
metrics must match the same step computed locally on the full batch
(DP-equivalence, multi-process edition).
"""

import os
import sys

rank = int(sys.argv[1])
coordinator = sys.argv[2]

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from kmpc_tpu.parallel.distributed import (  # noqa: E402
    host_local_to_global,
    initialize_distributed,
    make_global_mesh,
    process_local_batch_size,
)

# The fixed init-order contract: this must be the FIRST thing that
# touches the runtime (no jax.devices()/process_count() before it).
initialize_distributed(
    coordinator_address=coordinator, num_processes=2, process_id=rank
)
assert jax.distributed.is_initialized()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

# Idempotent second call must be a no-op (the is_initialized branch).
initialize_distributed()

mesh = make_global_mesh({"data": -1})
assert mesh.shape["data"] == 8

# --- host_local_to_global round-trip + cross-process reduction --------
GB, F = 16, 3
lb = process_local_batch_size(GB)
assert lb == 8
full = (np.arange(GB, dtype=np.float32)[:, None] * np.ones((1, F), np.float32))
local = full[rank * lb : (rank + 1) * lb]
g = host_local_to_global(mesh, P("data"), local)
assert g.shape == (GB, F), g.shape
total = jax.jit(jnp.sum)(g)  # cross-host reduction inserted by SPMD
expected = float(full.sum())
assert abs(float(total) - expected) < 1e-4, (float(total), expected)

# --- one DP train step on a globally-sharded batch ---------------------
from kmpc_tpu.config import get_config  # noqa: E402
from kmpc_tpu.data.systems import make_system  # noqa: E402
from kmpc_tpu.models import make_model  # noqa: E402
from kmpc_tpu.train.loop import init_train_state, make_train_step  # noqa: E402

cfg = get_config("generic")
cfg.MODEL.TARGET_SIZE = 8
cfg.TRAIN.BATCH_SIZE = GB
system = make_system(cfg, "duffing")
model = make_model(cfg, system.observation_size)

state = init_train_state(cfg, model, jax.random.PRNGKey(0))
# Replicated global train state: every process holds identical values
# (same PRNG key), so a replicated device_put is consistent.
rep = NamedSharding(mesh, P())
state_g = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)

seq = np.asarray(
    system.sequence_batch(jax.random.PRNGKey(1), GB, cfg.TRAIN.SEQUENCE_LENGTH)
)
if cfg.TRAIN.USE_SEQUENCE_LOSS:
    batch_full = jnp.asarray(seq)
    local_batch = seq[rank * lb : (rank + 1) * lb]
    batch_g = host_local_to_global(mesh, P("data"), local_batch)
else:
    batch_full = (jnp.asarray(seq[:, 0]), jnp.asarray(seq[:, 1]))
    local = seq[rank * lb : (rank + 1) * lb]
    batch_g = (
        host_local_to_global(mesh, P("data"), local[:, 0]),
        host_local_to_global(mesh, P("data"), local[:, 1]),
    )

train_step = make_train_step(cfg, model, dt=cfg.ENV.DUFFING.DT)
state2, metrics = train_step(state_g, batch_g)
loss_sharded = float(metrics["loss"])

# Local (unsharded, single-process semantics) reference on the SAME
# full batch — both processes can compute it because the batch is
# seed-deterministic.
state_l = init_train_state(cfg, model, jax.random.PRNGKey(0))
_, metrics_l = train_step(state_l, batch_full)
loss_local = float(metrics_l["loss"])
assert abs(loss_sharded - loss_local) < 1e-5, (loss_sharded, loss_local)

# Params after the step must remain replicated and identical across
# processes: compare a parameter checksum via a global reduction.
leaf = state2["params"]["kmat"]
checksum = float(jnp.sum(jnp.abs(leaf)))
csum_g = jax.jit(jnp.sum)(
    host_local_to_global(
        mesh, P("data"),
        np.full((lb, 1), checksum / lb, np.float32),
    )
)
assert abs(float(csum_g) / 2.0 - checksum) < 1e-3 * max(checksum, 1.0)

print(f"WORKER_OK rank={rank} loss={loss_sharded:.6f}")

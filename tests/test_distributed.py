"""True multi-process distributed execution test.

Launches TWO local processes, each with 4 virtual CPU devices, that
coordinate through jax.distributed.initialize — executing the code
paths single-process sharding tests cannot reach:
``initialize_distributed``'s argument path and is_initialized no-op
branch, ``host_local_to_global``'s make_array_from_process_local_data
branch, a cross-process SPMD reduction, and a data-parallel train step
over a globally-sharded batch that must match single-process numerics
(see tests/_distributed_worker.py for the worker program).

Also pins the init-order contract: initialize_distributed must not
touch the local backend before jax.distributed.initialize (the bug
class: calling jax.process_count() pre-init initializes the local
backend and poisons real pod startup).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    repo = Path(__file__).resolve().parent.parent
    worker = Path(__file__).resolve().parent / "_distributed_worker.py"
    coord = f"localhost:{_free_port()}"

    # Clear inherited XLA_FLAGS (the suite's conftest may export an
    # 8-device flag); the worker sets its own 4-device flag.
    env = dict(os.environ, PYTHONPATH=str(repo), XLA_FLAGS="")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), coord],
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (
            f"rank {rank} failed\nstdout:\n{out[-2000:]}\n"
            f"stderr:\n{err[-4000:]}"
        )
        assert f"WORKER_OK rank={rank}" in out
        outs.append(out)

    # Both processes computed the same global loss (SPMD determinism).
    loss0 = outs[0].split("loss=")[1].split()[0]
    loss1 = outs[1].split("loss=")[1].split()[0]
    assert loss0 == loss1, (loss0, loss1)


def test_initialize_distributed_does_not_touch_backend_preinit():
    """In a fresh process with no coordinator env, initialize_distributed
    must return without initializing the local backend (pod-startup
    safety). jax.devices() initializes the backend, so we check the
    internal backend cache is still empty after the call."""
    repo = Path(__file__).resolve().parent.parent
    code = (
        "import jax\n"
        "from kmpc_tpu.parallel.distributed import initialize_distributed\n"
        "initialize_distributed()\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, xla_bridge._backends\n"
        "print('NO_BACKEND_OK')\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, capture_output=True,
        text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "NO_BACKEND_OK" in res.stdout

"""Utility tests: metrics logger artifact contract, profiler helpers."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from kmpc_tpu.utils.logger import MetricsLogger
from kmpc_tpu.utils.profiler import StageTimer, benchmark, sync


# ---------------------------------------------------------------------------
# MetricsLogger (reference: train.py:45-115 artifact contract)
# ---------------------------------------------------------------------------


def test_logger_jsonl_and_summary(tmp_path):
    logger = MetricsLogger(tmp_path, flush_interval=2)
    logger.log_scalar("train/loss", 1.0, 0)
    logger.log_scalar("train/loss", 0.5, 1)   # triggers flush
    logger.log_dict({"a": 1.0, "b": 2.0}, step=2, prefix="eval")
    logger.close()

    lines = [json.loads(l) for l in open(tmp_path / "metrics_history.jsonl")]
    assert lines[0] == {"step": 0, "name": "train/loss", "value": 1.0}
    assert {l["name"] for l in lines} == {"train/loss", "eval/a", "eval/b"}

    summary = json.load(open(tmp_path / "metrics_summary.json"))
    assert summary["train/loss"] == {
        "final": 0.5, "min": 0.5, "max": 1.0, "mean": 0.75,
    }


def test_logger_buffering(tmp_path):
    logger = MetricsLogger(tmp_path, flush_interval=100)
    logger.log_scalar("x", 1.0, 0)
    # Not flushed yet.
    assert not (tmp_path / "metrics_history.jsonl").exists()
    logger.flush()
    assert (tmp_path / "metrics_history.jsonl").exists()


# ---------------------------------------------------------------------------
# Profiler helpers
# ---------------------------------------------------------------------------


def test_sync_returns_checksum():
    x = jnp.ones((4, 4))
    total = sync({"a": x, "b": 2 * x})
    assert np.isclose(total, 16.0 + 32.0)
    assert sync({"nothing": None}) == 0.0


def test_benchmark_timing():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((64,))
    res = benchmark(f, x, reps=3, warmup=1)
    assert res["reps"] == 3
    assert 0 < res["best_s"] <= res["mean_s"]


def test_stage_timer():
    timer = StageTimer()
    for _ in range(2):
        with timer.stage("work"):
            time.sleep(0.01)
    s = timer.summary()
    assert s["work"]["count"] == 2
    assert s["work"]["total_s"] >= 0.02
    report = timer.report()
    assert "work" in report and "mean_ms" in report


# ---------------------------------------------------------------------------
# Orbax checkpoint backend
# ---------------------------------------------------------------------------


def test_orbax_checkpoint_round_trip(tmp_path):
    from kmpc_tpu.utils.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    state = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros(4)},
        "step": jnp.asarray(7, jnp.int32),
    }
    save_checkpoint_orbax(tmp_path / "ck", state, step=7,
                          config_dict={"x": 1}, extra={"note": "hi"})
    restored, meta = load_checkpoint_orbax(tmp_path / "ck", state)
    assert meta["step"] == 7
    assert meta["extra"]["note"] == "hi"
    assert np.allclose(np.asarray(restored["params"]["w"]),
                       np.asarray(state["params"]["w"]))


def test_orbax_checkpoint_sharded_round_trip(tmp_path):
    """Sharded save -> restore with shardings preserved: each leaf is
    laid out over the virtual 8-device mesh, written via Orbax, and
    restored into the same NamedSharding (SURVEY.md §5 multi-host
    checkpoint path)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kmpc_tpu.parallel.mesh import make_mesh
    from kmpc_tpu.utils.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    mesh = make_mesh({"data": 4, "scenario": 2, "model": 1})
    sh = NamedSharding(mesh, P("data", None))
    w = jax.device_put(jnp.arange(64.0).reshape(8, 8), sh)
    state = {"params": {"w": w}, "step": jnp.asarray(3, jnp.int32)}
    save_checkpoint_orbax(tmp_path / "ck", state, step=3)

    like = {
        "params": {"w": jax.device_put(jnp.zeros((8, 8)), sh)},
        "step": jnp.asarray(0, jnp.int32),
    }
    restored, meta = load_checkpoint_orbax(tmp_path / "ck", like)
    assert meta["step"] == 3
    assert restored["params"]["w"].sharding == sh
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(w)
    )

"""Mesh/sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed execution; these tests cover the new
SPMD layer: mesh construction, tensor-parallel param placement,
data-parallel training-step equivalence vs single-device, and the
scenario-sharded MPC solver (SURVEY.md §4 "multi-node" guidance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from kmpc_tpu.config import get_config
from kmpc_tpu.models import make_model
from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch
from kmpc_tpu.parallel.mesh import (
    make_mesh,
    mesh_from_config,
    param_specs,
    shard_batch,
    shard_params,
    sharded_mpc_solver,
)
from kmpc_tpu.train.loop import init_train_state, make_train_step

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _cfg(z=64):
    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = z
    cfg.MODEL.ENCODER.LAYERS = [64]
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.TRAIN.SEQUENCE_LENGTH = 4
    return cfg


# ---------------------------------------------------------------------------
# Mesh construction
# ---------------------------------------------------------------------------


@requires_8
def test_make_mesh_shapes():
    mesh = make_mesh({"data": 2, "scenario": 2, "model": 2})
    assert mesh.shape == {"data": 2, "scenario": 2, "model": 2}
    mesh = make_mesh({"data": -1})
    assert mesh.shape["data"] == jax.device_count()


@requires_8
def test_make_mesh_wildcard():
    mesh = make_mesh({"data": 2, "scenario": -1})
    assert mesh.shape["scenario"] == jax.device_count() // 2


def test_make_mesh_bad_shape_raises():
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "scenario": 5, "model": 7})


@requires_8
def test_mesh_from_config():
    cfg = _cfg()
    cfg.PARALLEL.DATA = 4
    cfg.PARALLEL.SCENARIO = 2
    cfg.PARALLEL.MODEL = 1
    mesh = mesh_from_config(cfg)
    assert mesh.shape == {"data": 4, "scenario": 2, "model": 1}


# ---------------------------------------------------------------------------
# Param sharding
# ---------------------------------------------------------------------------


@requires_8
def test_param_specs_tensor_parallel():
    cfg = _cfg()
    model = make_model(cfg, 40)
    params = model.init(jax.random.PRNGKey(0))
    specs = param_specs(model, params)
    assert specs["kmat"] == P(None, "model")
    # Final encoder layer sharded on output (latent) dim.
    assert specs["encoder"][-1]["w"] == P(None, "model")
    # First decoder layer sharded on input (latent) dim.
    assert specs["decoder"][0]["w"] == P("model", None)


@requires_8
def test_shard_params_places_on_mesh():
    mesh = make_mesh({"data": 2, "scenario": 2, "model": 2})
    cfg = _cfg(z=64)
    model = make_model(cfg, 40)
    params = model.init(jax.random.PRNGKey(0))
    sharded = shard_params(params, model, mesh)
    sh = sharded["kmat"].sharding
    assert sh.spec == P(None, "model")
    # Values unchanged by placement.
    assert np.allclose(np.asarray(sharded["kmat"]), np.asarray(params["kmat"]))


@requires_8
def test_shard_params_indivisible_falls_back_to_replication():
    mesh = make_mesh({"data": 1, "scenario": 1, "model": -1})
    cfg = _cfg(z=30)  # 30 not divisible by 8
    model = make_model(cfg, 40)
    params = model.init(jax.random.PRNGKey(0))
    sharded = shard_params(params, model, mesh)
    assert sharded["kmat"].sharding.spec == P()


# ---------------------------------------------------------------------------
# Sharded training step == single-device step
# ---------------------------------------------------------------------------


@requires_8
def test_sharded_train_step_matches_single_device():
    cfg = _cfg(z=64)
    obs = 40
    model = make_model(cfg, obs)

    state_a = init_train_state(cfg, model, jax.random.PRNGKey(0))
    state_b = init_train_state(cfg, model, jax.random.PRNGKey(0))

    step = make_train_step(cfg, model, dt=1.0)
    x_seq = jax.random.normal(
        jax.random.PRNGKey(1), (16, cfg.TRAIN.SEQUENCE_LENGTH + 1, obs)
    )

    # Single device (replicated) run.
    state_a, metrics_a = step(state_a, x_seq)

    # DP+TP sharded run.
    mesh = make_mesh({"data": 2, "scenario": 2, "model": 2})
    state_b["params"] = shard_params(state_b["params"], model, mesh)
    xb = shard_batch(x_seq, mesh, ("data", "scenario"))
    state_b, metrics_b = step(state_b, xb)

    assert np.allclose(float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-4)
    ka = np.asarray(state_a["params"]["kmat"])
    kb = np.asarray(state_b["params"]["kmat"])
    assert np.allclose(ka, kb, atol=1e-5)


# ---------------------------------------------------------------------------
# Scenario-sharded MPC
# ---------------------------------------------------------------------------


@requires_8
@pytest.mark.slow
def test_sharded_mpc_matches_unsharded():
    mesh = make_mesh({"data": 2, "scenario": 4, "model": 1})
    params = MPCParams(max_iters=300)
    rng = np.random.default_rng(0)
    B, H, N = 32, 5, 12
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)

    w_ref, _ = solve_mpc_log_utility_batch(cw, ys, params)
    solve = sharded_mpc_solver(mesh, params)
    w_sh, info = solve(cw, ys)
    assert np.allclose(np.asarray(w_ref), np.asarray(w_sh), atol=1e-5)


@requires_8
def test_sharded_fused_kernel_matches_unsharded():
    """The batch-in-lanes Pallas kernel shards over the mesh via
    jax.shard_map (per-device kernel calls; interpret mode on CPU)."""
    mesh = make_mesh({"data": 2, "scenario": 4, "model": 1})
    params = MPCParams(max_iters=1000)
    rng = np.random.default_rng(1)
    B, H, N = 32, 5, 12
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)

    w_ref, _ = solve_mpc_log_utility_batch(cw, ys, params)
    solve = sharded_mpc_solver(mesh, params, use_fused_kernel=True)
    w_sh, info = solve(cw, ys)
    assert w_sh.shape == (B, H, N)
    assert bool(np.all(np.asarray(info["converged"])))
    # Solver-tolerance agreement (different iteration layout, same math).
    assert np.max(np.abs(np.asarray(w_ref) - np.asarray(w_sh))) < 5e-4


@requires_8
def test_graft_entry_dryrun():
    """The driver's multichip dry run must pass on the virtual mesh."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


# ---------------------------------------------------------------------------
# Distributed helpers (single-process semantics on the virtual mesh)
# ---------------------------------------------------------------------------


@requires_8
def test_host_local_to_global_single_process():
    from kmpc_tpu.parallel.distributed import (
        host_local_to_global,
        make_global_mesh,
        process_local_batch_size,
    )

    mesh = make_global_mesh({"data": -1})
    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = host_local_to_global(mesh, P("data"), local)
    assert arr.shape == (16, 3)
    assert np.allclose(np.asarray(arr), local)
    assert process_local_batch_size(64) == 64  # one process


def test_initialize_distributed_noop_single_host():
    from kmpc_tpu.parallel.distributed import initialize_distributed

    import os
    saved = os.environ.pop("TPU_WORKER_HOSTNAMES", None)
    try:
        initialize_distributed()  # must be a no-op, not raise
    finally:
        if saved is not None:
            os.environ["TPU_WORKER_HOSTNAMES"] = saved


def test_scaling_report():
    from kmpc_tpu.parallel.distributed import scaling_report

    rep = scaling_report(80_000.0, num_chips=2, per_chip_baseline=50_000.0)
    assert rep["scaling_efficiency"] == pytest.approx(0.8)


@requires_8
@pytest.mark.slow
def test_train_finance_with_parallel_config(tmp_path):
    """cfg.PARALLEL drives mesh sharding inside train_finance."""
    from kmpc_tpu.config import FinanceConfig, get_config
    from kmpc_tpu.train.loop import train_finance

    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = 16
    cfg.MODEL.ENCODER.LAYERS = [32]
    cfg.TRAIN.NUM_STEPS = 4
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.EVAL_INTERVAL = 3
    cfg.ENV.FINANCE = FinanceConfig(
        TICKERS=["T1", "T2", "T3"], START_DATE="2018-01-01",
        END_DATE="2021-12-31", TRAIN_END="2019-12-31", VAL_END="2020-12-31",
        EMBEDDING_DIM=3, CACHE_DIR=None, SYNTHETIC=True,
    )
    cfg.PARALLEL.DATA = 2
    cfg.PARALLEL.SCENARIO = 2
    cfg.PARALLEL.MODEL = 2
    state, model, run_dir = train_finance(cfg, log_dir=str(tmp_path), verbose=False)
    assert int(state["step"]) == 4
    # kmat came back tensor-parallel sharded.
    assert state["params"]["kmat"].sharding.spec == P(None, "model")


# ---------------------------------------------------------------------------
# Full sharded workload surface (round-3: scenario/MV programs + the
# date-sharded Jacobi backtest — SURVEY §2 "Scenario/date parallel")
# ---------------------------------------------------------------------------


@requires_8
@pytest.mark.parametrize("fused", [False, True])
def test_sharded_scenario_solver_matches_unsharded(fused):
    from kmpc_tpu.ops.scenario import solve_mpc_log_utility_scenarios

    mesh = make_mesh({"data": 2, "scenario": 4, "model": 1})
    params = MPCParams(max_iters=200)
    rng = np.random.default_rng(3)
    B, S, H, N = 16, 4, 5, 12
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    scen = jnp.asarray(rng.standard_normal((B, S, H, N)) * 0.01, jnp.float32)

    w_ref, _ = solve_mpc_log_utility_scenarios(cw, scen, params)
    solve = sharded_mpc_solver(mesh, params, use_fused_kernel=fused,
                               program="scenario")
    w_sh, info = solve(cw, scen)
    assert w_sh.shape == (B, H, N)
    assert set(info) == {"objective", "converged", "turnover_violation",
                         "fixed_point_residual", "status_code"}
    tol = 5e-4 if fused else 1e-5
    assert np.max(np.abs(np.asarray(w_ref) - np.asarray(w_sh))) < tol


@requires_8
@pytest.mark.parametrize("fused", [False, True])
@pytest.mark.parametrize("shared_sigma", [False, True])
def test_sharded_mean_variance_solver_matches_unsharded(fused, shared_sigma):
    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch

    mesh = make_mesh({"data": 2, "scenario": 4, "model": 1})
    params = MPCParams(max_iters=300, gamma=5.0)
    rng = np.random.default_rng(4)
    B, H, N = 16, 1, 12
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    if shared_sigma:
        A = rng.standard_normal((N, N)) * 0.01
        sig = jnp.asarray(A @ A.T + np.eye(N) * 1e-4, jnp.float32)
    else:
        A = rng.standard_normal((B, N, N)) * 0.01
        sig = jnp.asarray(
            np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4, jnp.float32
        )

    w_ref, _ = solve_mpc_mean_variance_batch(cw, mu, sig, params)
    solve = sharded_mpc_solver(mesh, params, use_fused_kernel=fused,
                               program="mv")
    w_sh, info = solve(cw, mu, sig)
    assert w_sh.shape == (B, H, N)
    # MV has no turnover ball; the uniform info key is zero-filled.
    assert np.all(np.asarray(info["turnover_violation"]) == 0.0)
    tol = 5e-4 if fused else 1e-5
    assert np.max(np.abs(np.asarray(w_ref) - np.asarray(w_sh))) < tol


@requires_8
@pytest.mark.parametrize("fused", [False, True])
def test_date_sharded_parallel_backtest_matches_unsharded(fused):
    """make_parallel_backtester(mesh=...) shards the date axis; the
    history must equal the unsharded Jacobi run's (same solves,
    scattered). T is chosen NOT divisible by the 8 devices to exercise
    the edge padding."""
    from dataclasses import replace as dc_replace

    from test_backtest import _mock_finance_data

    from kmpc_tpu.backtest.engine import (
        DMDStrategy,
        make_parallel_backtester,
    )
    from kmpc_tpu.config import BacktestConfig

    fd = _mock_finance_data(T=48, N=6, seed=11)   # ~43 rebalance dates
    strat = DMDStrategy(mpc=MPCParams(max_iters=150),
                        use_fused_kernel=fused)
    cfg = BacktestConfig(HORIZON=3)

    run_ref, ts = make_parallel_backtester(strat, fd, cfg, num_sweeps=3)
    hist_ref = run_ref()

    mesh = make_mesh({"data": 2, "scenario": 4, "model": 1})
    assert len(ts) % 8 != 0, "test must exercise the date padding"
    run_sh, ts_sh = make_parallel_backtester(
        strat, fd, cfg, num_sweeps=3, mesh=mesh
    )
    hist_sh = run_sh()
    assert list(ts_sh) == list(ts)
    np.testing.assert_allclose(
        np.asarray(hist_sh["portfolio_value"]),
        np.asarray(hist_ref["portfolio_value"]), rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(hist_sh["weights"]), np.asarray(hist_ref["weights"]),
        atol=3e-5,
    )


@requires_8
def test_date_sharded_warm_sweeps_matches_unsharded():
    """The warm-sweep Jacobi path also shards by date (the (primal,
    dual) warm carry rides the sweep scan padded)."""
    from test_backtest import _mock_finance_data, _tiny_koopman

    from kmpc_tpu.backtest.engine import (
        KoopmanMPCStrategy,
        make_parallel_backtester,
    )
    from kmpc_tpu.config import BacktestConfig

    fd = _mock_finance_data(T=40, N=4, seed=13)
    model, params = _tiny_koopman(fd)
    strat = KoopmanMPCStrategy(model=model, params=params,
                               mpc=MPCParams(max_iters=200))
    cfg = BacktestConfig(HORIZON=3)

    run_ref, ts = make_parallel_backtester(
        strat, fd, cfg, num_sweeps=3, warm_sweeps_iters=50
    )
    hist_ref = run_ref()

    mesh = make_mesh({"data": 4, "scenario": 2, "model": 1})
    run_sh, _ = make_parallel_backtester(
        strat, fd, cfg, num_sweeps=3, warm_sweeps_iters=50, mesh=mesh
    )
    hist_sh = run_sh()
    np.testing.assert_allclose(
        np.asarray(hist_sh["portfolio_value"]),
        np.asarray(hist_ref["portfolio_value"]), rtol=2e-5,
    )

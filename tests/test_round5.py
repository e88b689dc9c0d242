"""Round-5 feature tests: diagonal preconditioning (MPCParams.precond),
pipelined kernel reduces (MPCParams.pipeline_reduces), and the
extended-precision polish stage (ops/mpc_polish.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch
from kmpc_tpu.ops.mpc_pallas import (
    solve_mpc_log_utility_pallas_packed,
    solve_mpc_log_utility_scenarios_packed,
)
from kmpc_tpu.ops.scenario import solve_mpc_log_utility_scenarios


def _instances(B=8, H=5, N=12, seed=0):
    rng = np.random.default_rng(seed)
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01 + 5e-4,
                     jnp.float32)
    return cw, ys


class TestPrecond:
    def test_kernel_matches_xla(self):
        cw, ys = _instances()
        p = MPCParams(max_iters=400, sigma_scale=2.0, precond=True)
        w_x, info_x = solve_mpc_log_utility_batch(cw, ys, p)
        w_k, info_k = solve_mpc_log_utility_pallas_packed(cw, ys, p)
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_x),
                                   atol=5e-6)
        assert bool(info_k["converged"].all())

    def test_kernel_matches_xla_adaptive(self):
        cw, ys = _instances()
        p = MPCParams(max_iters=400, sigma_scale=2.0, precond=True,
                      adaptive=True, adapt_every=2)
        w_x, _ = solve_mpc_log_utility_batch(cw, ys, p)
        w_k, _ = solve_mpc_log_utility_pallas_packed(cw, ys, p)
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_x),
                                   atol=5e-6)

    def test_scenario_kernel_matches_xla(self):
        rng = np.random.default_rng(1)
        B, S, H, N = 6, 4, 5, 12
        cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
        scen = jnp.asarray(rng.standard_normal((B, S, H, N)) * 0.01,
                           jnp.float32)
        p = MPCParams(max_iters=300, sigma_scale=2.0, precond=True)
        w_x, _ = solve_mpc_log_utility_scenarios(cw, scen, p)
        w_k, _ = solve_mpc_log_utility_scenarios_packed(cw, scen, p)
        np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_x),
                                   atol=5e-6)

    def test_same_solution_as_uniform_at_convergence(self):
        # Preconditioning changes the trajectory, not the program: at a
        # large budget both step schemes reach the same objective (the
        # weights still crawl along the near-flat faces, so the
        # objective — not the weight vector — is the convergence test).
        cw, ys = _instances(B=4)
        base = MPCParams(max_iters=6000, sigma_scale=2.0, ridge=1e-3)
        pre = MPCParams(max_iters=6000, sigma_scale=2.0, ridge=1e-3,
                        precond=True)
        w_u, info_u = solve_mpc_log_utility_batch(cw, ys, base)
        w_p, info_p = solve_mpc_log_utility_batch(cw, ys, pre)
        obj_diff = float(jnp.max(jnp.abs(info_u["objective"]
                                         - info_p["objective"])))
        assert obj_diff < 1e-4      # both eps-optimal; tails differ
        assert float(jnp.max(jnp.abs(w_u - w_p))) < 5e-2

    def test_config_roundtrip(self):
        from kmpc_tpu.config import get_config
        from kmpc_tpu.ops.mpc import mpc_params_from_config

        cfg = get_config("generic")
        cfg.MPC.SOLVER.PRECOND = True
        cfg.MPC.SOLVER.PIPELINE_REDUCES = True
        p = mpc_params_from_config(cfg)
        assert p.precond and p.pipeline_reduces


class TestPipelineReduces:
    def test_close_to_refresh_schedule(self):
        cw, ys = _instances()
        ref = MPCParams(max_iters=1000, sigma_scale=2.0,
                        proj_refresh_every=16)
        pipe = MPCParams(max_iters=1000, sigma_scale=2.0,
                         proj_refresh_every=16, pipeline_reduces=True)
        w_r, info_r = solve_mpc_log_utility_pallas_packed(cw, ys, ref)
        w_p, info_p = solve_mpc_log_utility_pallas_packed(cw, ys, pipe)
        assert bool(info_p["converged"].all())
        # One extra step of threshold lag: same solution up to the
        # documented trailing-threshold tail.
        assert float(jnp.max(jnp.abs(w_r - w_p))) < 5e-3
        obj_gap = float(jnp.max(jnp.abs(info_r["objective"]
                                        - info_p["objective"])))
        assert obj_gap < 1e-3

    def test_feasible_outputs(self):
        cw, ys = _instances(B=4)
        pipe = MPCParams(max_iters=500, sigma_scale=2.0,
                         proj_refresh_every=8, pipeline_reduces=True)
        w, info = solve_mpc_log_utility_pallas_packed(cw, ys, pipe)
        w = np.asarray(w)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        assert w.min() >= -1e-7
        u = w - np.concatenate([np.asarray(cw)[:, None], w[:, :-1]], 1)
        assert np.abs(u).sum(-1).max() <= 0.2 + 1e-6


class TestExtendedPolish:
    def test_ld_simplex_threshold_exact(self):
        from kmpc_tpu.ops.mpc_polish import _ld_simplex_threshold

        rng = np.random.default_rng(2)
        v = rng.standard_normal((7, 9)).astype(np.longdouble)
        th = _ld_simplex_threshold(v, np.longdouble(1.0))
        w = np.maximum(v - th, 0)
        np.testing.assert_allclose(
            np.asarray(w.sum(-1), np.float64), 1.0, atol=1e-15
        )

    def test_ld_lu_solve(self):
        from kmpc_tpu.ops.mpc_polish import _ld_lu_solve

        rng = np.random.default_rng(3)
        A = rng.standard_normal((40, 40)).astype(np.longdouble)
        x = rng.standard_normal(40).astype(np.longdouble)
        b = A @ x
        x2 = _ld_lu_solve(A, b)
        assert float(np.abs(np.asarray(x - x2, np.float64)).max()) < 1e-10

    @pytest.mark.slow
    def test_certifies_equal_weight_tie_instance(self):
        # The maximal-tie class (cw = 1/N exactly — every backtest's
        # first solve, reference: backtest.py:160-161): the f64 polish
        # stack parks at ~1e-9 residual; the longdouble stage must take
        # the f64 certificate residual below the 1e-10 bar.
        from kmpc_tpu.ops.mpc import MPCParams as P
        from kmpc_tpu.ops.mpc_polish import (
            solve_mpc_log_utility_batch_polished,
        )

        rng = np.random.default_rng(7)
        N = 10
        cw = jnp.asarray(np.full((1, N), 1.0 / N), jnp.float32)
        ys = jnp.asarray(rng.standard_normal((1, 5, N)) * 1e-4,
                         jnp.float32)
        params = P(max_iters=8000, sigma_scale=2.0, ridge=1e-3,
                   polish=True, polish_newton=4)
        w, info = solve_mpc_log_utility_batch_polished(cw, ys, params,
                                                       cycles=4)
        assert float(info["residual_after"][0]) < 1e-10

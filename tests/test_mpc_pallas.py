"""Pallas fused-solver tests (interpret mode on CPU): numerical agreement
with the XLA-scan solver, padding/masking correctness."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch


def _instance(B=8, H=5, N=20, seed=0):
    rng = np.random.default_rng(seed)
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    return cw, ys


def test_packed_no_turnover_ball():
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=4, N=10, seed=2)
    params = MPCParams(max_iters=500, sigma_scale=2.0, max_turnover=0.0)
    w, info = solve_mpc_log_utility_pallas_packed(
        cw, ys, params, tile_b=128, interpret=True
    )
    assert np.allclose(np.asarray(w).sum(-1), 1.0, atol=1e-4)
    w_x, _ = solve_mpc_log_utility_batch(cw, ys, params)
    assert np.max(np.abs(np.asarray(w) - np.asarray(w_x))) < 5e-4


@pytest.mark.slow
def test_packed_matches_xla_solver():
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=9, H=5, N=30)
    params = MPCParams(max_iters=2000, sigma_scale=2.0,
                       restore_feasibility=False)
    w_ref, info_ref = solve_mpc_log_utility_batch(cw, ys, params)
    w_pk, info_pk = solve_mpc_log_utility_pallas_packed(
        cw, ys, params, tile_b=128, interpret=True
    )
    assert np.max(np.abs(np.asarray(w_ref) - np.asarray(w_pk))) < 5e-4
    assert np.max(np.abs(
        np.asarray(info_ref["objective"]) - np.asarray(info_pk["objective"])
    )) < 1e-5


def test_packed_feasibility_odd_shapes():
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    # Batch below the lane tile; asset count not a sublane multiple.
    cw, ys = _instance(B=11, N=7, seed=1)
    params = MPCParams(max_iters=500, sigma_scale=2.0)
    w, info = solve_mpc_log_utility_pallas_packed(
        cw, ys, params, tile_b=128, interpret=True
    )
    w = np.asarray(w)
    assert w.shape == (11, 5, 7)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-4)
    assert np.all(w >= -1e-6)
    u = np.diff(np.concatenate([np.asarray(cw)[:, None], w], axis=1), axis=1)
    assert np.all(np.abs(u).sum(-1) <= params.max_turnover + 2e-3)


@pytest.mark.slow
def test_packed_shape_fuzz():
    """Edge shapes: tiny batch, H=1, asset counts straddling the sublane
    tile. Feasibility must hold exactly; objective must track the XLA
    solver closely on every instance."""
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    params = MPCParams(max_iters=800, sigma_scale=2.0)
    for seed, (B, H, N) in enumerate(
        [(1, 5, 30), (3, 1, 8), (5, 7, 9), (2, 5, 33), (130, 2, 3)]
    ):
        cw, ys = _instance(B=B, H=H, N=N, seed=seed)
        w, info = solve_mpc_log_utility_pallas_packed(
            cw, ys, params, tile_b=128, interpret=True
        )
        w = np.asarray(w)
        assert w.shape == (B, H, N)
        assert np.allclose(w.sum(-1), 1.0, atol=1e-4), (B, H, N)
        assert np.all(w >= -1e-6), (B, H, N)
        u = np.diff(
            np.concatenate([np.asarray(cw)[:, None], w], axis=1), axis=1
        )
        assert np.all(np.abs(u).sum(-1) <= params.max_turnover + 1e-5)
        _, info_ref = solve_mpc_log_utility_batch(cw, ys, params)
        assert np.max(np.abs(
            np.asarray(info["objective"]) - np.asarray(info_ref["objective"])
        )) < 5e-4, (B, H, N)


def test_packed_warm_continuation():
    """A warm-started 200-iteration continuation from a 600-iteration
    solve's (primal, dual) must land where an 800-iteration cold solve
    lands, and must agree with the XLA solver's warm path."""
    from dataclasses import replace

    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=9, H=5, N=30)
    params = MPCParams(max_iters=600, sigma_scale=2.0,
                       restore_feasibility=False)
    w1, i1 = solve_mpc_log_utility_pallas_packed(
        cw, ys, params, return_dual=True, interpret=True
    )
    assert i1["dual"].shape == (9, 5, 30)
    p200 = replace(params, max_iters=200)
    w2, _ = solve_mpc_log_utility_pallas_packed(
        cw, ys, p200, w_warm=w1, p_warm=i1["dual"], interpret=True
    )
    w_cold, _ = solve_mpc_log_utility_pallas_packed(
        cw, ys, replace(params, max_iters=800), interpret=True
    )
    # Not bit-exact: the returned iterate is the XLA-matching extra
    # half-step (w_last), so restarting from it perturbs the trajectory
    # by one projected gradient step — same property as the XLA solver.
    assert np.max(np.abs(np.asarray(w2) - np.asarray(w_cold))) < 5e-4
    w2x, _ = solve_mpc_log_utility_batch(
        cw, ys, p200, w_warm=w1, p_warm=i1["dual"]
    )
    assert np.max(np.abs(np.asarray(w2) - np.asarray(w2x))) < 5e-4


@pytest.mark.slow
def test_packed_scenarios_match_xla():
    from kmpc_tpu.ops.mpc_pallas import (
        solve_mpc_log_utility_scenarios_packed,
    )
    from kmpc_tpu.ops.scenario import solve_mpc_log_utility_scenarios

    rng = np.random.default_rng(3)
    B, S, H, N = 6, 4, 5, 30
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    scen = jnp.asarray(rng.standard_normal((B, S, H, N)) * 0.01, jnp.float32)
    params = MPCParams(max_iters=1500, sigma_scale=2.0)
    w_ref, i_ref = solve_mpc_log_utility_scenarios(cw, scen, params)
    w_pk, i_pk = solve_mpc_log_utility_scenarios_packed(
        cw, scen, params, tile_b=128, interpret=True
    )
    assert np.max(np.abs(np.asarray(w_ref) - np.asarray(w_pk))) < 5e-4
    assert np.max(np.abs(
        np.asarray(i_ref["objective"]) - np.asarray(i_pk["objective"])
    )) < 5e-5
    # Scenario count surfaced for diagnostics.
    assert int(i_pk["num_scenarios"]) == S


def test_packed_allow_short_delegates_to_xla():
    """allow_short needs the hyperplane projection the kernels lack; the
    wrapper must return the XLA solution, not a silently long-only one."""
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=6, N=10, seed=3)
    params = MPCParams(max_iters=400, sigma_scale=2.0, allow_short=True)
    w_ref, info_ref = solve_mpc_log_utility_batch(cw, ys, params)
    w_pk, info_pk = solve_mpc_log_utility_pallas_packed(cw, ys, params)
    np.testing.assert_allclose(np.asarray(w_pk), np.asarray(w_ref), atol=0)
    # Shorts actually occur in a 400-iteration unconstrained-sign solve
    # of noisy returns — otherwise this test wouldn't be exercising the
    # hyperplane (vs simplex) projection path at all.
    assert float(jnp.min(w_ref)) < -1e-6


def test_packed_over_relax_matches_xla():
    """over_relax is implemented IN-KERNEL (rho-relaxed iterates, same
    recursion as ops/mpc.py:260-262) — results must track the XLA
    solver's rho path, and rho must actually change the trajectory."""
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=4, N=8, seed=4)
    params = MPCParams(max_iters=600, sigma_scale=2.0, over_relax=1.5)
    w_ref, i_ref = solve_mpc_log_utility_batch(cw, ys, params)
    w_pk, i_pk = solve_mpc_log_utility_pallas_packed(
        cw, ys, params, tile_b=128, interpret=True
    )
    assert np.max(np.abs(np.asarray(w_pk) - np.asarray(w_ref))) < 5e-4
    assert np.max(np.abs(
        np.asarray(i_pk["objective"]) - np.asarray(i_ref["objective"])
    )) < 1e-5
    w_plain, _ = solve_mpc_log_utility_pallas_packed(
        cw, ys, MPCParams(max_iters=600, sigma_scale=2.0),
        tile_b=128, interpret=True,
    )
    assert not np.array_equal(np.asarray(w_pk), np.asarray(w_plain))


def test_packed_cold_projections_match_xla():
    """proj_warm_iters=0 = cold full-budget projections each iteration."""
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=6, N=12, seed=5)
    params = MPCParams(max_iters=800, sigma_scale=2.0, proj_warm_iters=0)
    w_ref, _ = solve_mpc_log_utility_batch(cw, ys, params)
    w_pk, _ = solve_mpc_log_utility_pallas_packed(cw, ys, params)
    assert np.max(np.abs(np.asarray(w_ref) - np.asarray(w_pk))) < 5e-4


def test_packed_nan_forecast_holds_weights():
    """A non-finite solve must fall back to hold-current-weights
    (reference: mpc.py:113-116), matching the XLA solver, instead of
    poisoning downstream backtests with NaN."""
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=4, N=10, seed=6)
    ys = ys.at[1].set(2.0e38)  # r = exp(...) overflows -> NaN iterates
    params = MPCParams(max_iters=100, sigma_scale=2.0)
    w, info = solve_mpc_log_utility_pallas_packed(cw, ys, params)
    assert bool(jnp.all(jnp.isfinite(w)))
    np.testing.assert_allclose(
        np.asarray(w[1]), np.broadcast_to(np.asarray(cw[1]), w[1].shape),
        atol=0,
    )
    assert not bool(info["converged"][1])
    assert bool(info["converged"][0])


def test_packed_oversize_working_set_delegates():
    """A working set over the VMEM budget at the minimum 128-lane tile
    must fall back to the XLA solver, not fail the compile."""
    from kmpc_tpu.ops.mpc_pallas import (
        _default_tile_b_packed,
        solve_mpc_log_utility_scenarios_packed,
    )

    assert _default_tile_b_packed(5, 32) == 128
    assert _default_tile_b_packed(5, 512) == 128
    assert _default_tile_b_packed(20, 512) is None       # 41 MB > budget
    assert _default_tile_b_packed(5, 512, S=16) is None  # scenario blow-up
    # Warm-start inputs + dual output add 3 declared [H, NP, tb] blocks;
    # the N=500 warm Jacobi path must fall back rather than overflow the
    # measured VMEM budget.
    assert _default_tile_b_packed(5, 504, extra_blocks=3) is None
    assert _default_tile_b_packed(5, 32, extra_blocks=3) == 128

    # The adaptive body keeps dw/dp + two residual expressions live: its
    # +3 declared blocks push the borderline N=500/H=5 working set over
    # budget so it takes the graceful XLA fallback instead of an opaque
    # remote-compile VMEM overflow.
    from kmpc_tpu.ops.mpc import MPCParams as _P
    from kmpc_tpu.ops.mpc_pallas import _adaptive_extra_blocks

    assert _adaptive_extra_blocks(_P(adaptive=False)) == 0
    assert _adaptive_extra_blocks(_P(adaptive=True)) == 3
    assert _default_tile_b_packed(
        5, 504, extra_blocks=_adaptive_extra_blocks(_P(adaptive=True))
    ) is None

    # Tiny shapes but forced through the scenario wrapper's fallback
    # branch via an oversize S*H*NP product is too slow for CI; instead
    # check the wrapper accepts the delegation path on allow_short.
    rng = np.random.default_rng(7)
    cw = jnp.asarray(rng.dirichlet(np.ones(6), size=3), jnp.float32)
    scen = jnp.asarray(rng.standard_normal((3, 4, 3, 6)) * 0.01, jnp.float32)
    params = MPCParams(max_iters=100, sigma_scale=2.0, allow_short=True)
    w, info = solve_mpc_log_utility_scenarios_packed(cw, scen, params)
    assert w.shape == (3, 3, 6)
    assert bool(jnp.all(jnp.isfinite(w)))


def test_packed_refresh_schedule_matches_full_budget():
    """proj_refresh_every: single warm Newton sweeps between periodic
    full-budget refreshes must track the full-budget solution within the
    usual epsilon-optimal tails (measured 5e-5 at 1000 iters on-chip)."""
    from dataclasses import replace

    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=6, N=12, seed=8)
    base = MPCParams(max_iters=400, sigma_scale=2.0)
    w_full, i_full = solve_mpc_log_utility_pallas_packed(cw, ys, base)
    w_ref, i_ref = solve_mpc_log_utility_pallas_packed(
        cw, ys, replace(base, proj_refresh_every=16)
    )
    assert np.max(np.abs(np.asarray(w_full) - np.asarray(w_ref))) < 5e-4
    np.testing.assert_allclose(
        np.asarray(i_ref["objective"]), np.asarray(i_full["objective"]),
        atol=1e-5,
    )
    # The schedule is a packed-kernel knob: config plumbing carries it.
    from kmpc_tpu.config import get_config
    from kmpc_tpu.ops.mpc import mpc_params_from_config

    cfg = get_config("finance_sparse")
    cfg.MPC.SOLVER.PROJ_REFRESH_EVERY = 8
    assert mpc_params_from_config(cfg).proj_refresh_every == 8


@pytest.mark.slow
def test_packed_mean_variance_matches_xla():
    """Packed MV kernel (Markowitz's program) vs the XLA solver: same
    iteration, same info keys, tight parity (the MV objective is a real
    QP — no flat-face degeneracy)."""
    from dataclasses import replace

    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_mean_variance_pallas_packed

    rng = np.random.default_rng(12)
    B, H, N = 6, 4, 10
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    A = rng.standard_normal((B, N, N)) * 0.05
    Sig = jnp.asarray(
        np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4, jnp.float32
    )
    p = MPCParams(max_iters=1200, sigma_scale=2.0, gamma=5.0)
    w_x, i_x = solve_mpc_mean_variance_batch(cw, mu, Sig, p)
    w_pk, i_pk = solve_mpc_mean_variance_pallas_packed(cw, mu, Sig, p)
    assert np.max(np.abs(np.asarray(w_x) - np.asarray(w_pk))) < 5e-5
    np.testing.assert_allclose(
        np.asarray(i_pk["objective"]), np.asarray(i_x["objective"]),
        atol=1e-6,
    )
    assert bool(jnp.all(i_pk["converged"]))
    # Sweep schedule (H=1 = the Markowitz shape) stays on the program.
    w_r, _ = solve_mpc_mean_variance_pallas_packed(
        cw, mu[:, :1], Sig, replace(p, proj_refresh_every=16)
    )
    w_x1, _ = solve_mpc_mean_variance_batch(cw, mu[:, :1], Sig, p)
    assert np.max(np.abs(np.asarray(w_r) - np.asarray(w_x1))) < 5e-5


def test_packed_mean_variance_shared_sigma():
    """An unbatched [N, N] covariance must not be expanded to [B, N, N]
    host-side: it rides a constant-index-map VMEM block. Parity vs the
    XLA solver with the broadcast Sigma, for both [N, N] and [1, N, N]."""
    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_mean_variance_pallas_packed

    rng = np.random.default_rng(21)
    B, H, N = 5, 3, 12
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    A = rng.standard_normal((N, N)) * 0.05
    Sig = jnp.asarray(A @ A.T + np.eye(N) * 1e-4, jnp.float32)
    p = MPCParams(max_iters=1200, sigma_scale=2.0, gamma=5.0)
    w_x, i_x = solve_mpc_mean_variance_batch(cw, mu, Sig, p)
    for sig_in in (Sig, Sig[None]):
        w_pk, i_pk = solve_mpc_mean_variance_pallas_packed(cw, mu, sig_in, p)
        assert np.max(np.abs(np.asarray(w_x) - np.asarray(w_pk))) < 5e-5
        np.testing.assert_allclose(
            np.asarray(i_pk["objective"]), np.asarray(i_x["objective"]),
            atol=1e-6,
        )
        assert bool(jnp.all(i_pk["converged"]))


def test_packed_mean_variance_fallbacks():
    """allow_short and oversize-Sigma working sets delegate to the XLA
    solver bit-exactly."""
    from dataclasses import replace

    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_mean_variance_pallas_packed

    rng = np.random.default_rng(13)
    B, H, N = 4, 3, 8
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    A = rng.standard_normal((B, N, N)) * 0.05
    Sig = jnp.asarray(
        np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4, jnp.float32
    )
    p = MPCParams(max_iters=300, sigma_scale=2.0, gamma=5.0,
                  allow_short=True)
    w_pk, _ = solve_mpc_mean_variance_pallas_packed(cw, mu, Sig, p)
    w_x, _ = solve_mpc_mean_variance_batch(cw, mu, Sig, p)
    np.testing.assert_allclose(np.asarray(w_pk), np.asarray(w_x), atol=0)
    # Oversize Sigma (N=500 -> 130 MB/lane-tile) must not crash: force
    # the size gate with tile_b=None default on a fake-large N via the
    # wrapper's own estimate (checked statically here).
    NP = ((500 + 7) // 8) * 8
    assert (NP * NP + 6 * 5 * NP) * 128 * 4 > 8 * 1024 * 1024


def test_markowitz_fused_matches_unfused():
    from kmpc_tpu.backtest.engine import MarkowitzStrategy

    rng = np.random.default_rng(14)
    T, N = 40, 6
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=T), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((T, N)) * 0.01, jnp.float32)
    A = rng.standard_normal((T, N, N)) * 0.05
    sig = jnp.asarray(
        np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4, jnp.float32
    )
    aux = {"mu": mu, "sigma": sig,
           "has_data": jnp.arange(T) >= 5}
    p = MPCParams(max_iters=600, sigma_scale=2.0, gamma=5.0)
    w_ref = MarkowitzStrategy(mpc=p).rebalance_all(aux, cw)
    w_fused = MarkowitzStrategy(mpc=p, use_fused_kernel=True).rebalance_all(aux, cw)
    assert np.max(np.abs(np.asarray(w_ref) - np.asarray(w_fused))) < 5e-5


@pytest.mark.slow
def test_fallback_info_structure_matches_packed():
    """The XLA-fallback paths must return the SAME info pytree structure
    as the kernel paths — shard_map callers (parallel/mesh.py) declare
    out_specs for the packed keys, so a parameter-dependent extra key
    would crash them instead of delegating."""
    from dataclasses import replace

    import jax

    from kmpc_tpu.ops.mpc_pallas import (
        solve_mpc_log_utility_pallas_packed,
        solve_mpc_log_utility_scenarios_packed,
    )

    cw, ys = _instance(B=4, N=8, seed=9)
    base = MPCParams(max_iters=50, sigma_scale=2.0)
    struct = lambda info: jax.tree_util.tree_structure(info)

    _, i_pk = solve_mpc_log_utility_pallas_packed(cw, ys, base)
    _, i_fb = solve_mpc_log_utility_pallas_packed(
        cw, ys, replace(base, allow_short=True)
    )
    assert struct(i_pk) == struct(i_fb)

    # With return_dual both paths must carry the dual too.
    w0 = jnp.zeros_like(ys)
    _, i_pkd = solve_mpc_log_utility_pallas_packed(
        cw, ys, base, w_warm=w0, p_warm=w0, return_dual=True
    )
    _, i_fbd = solve_mpc_log_utility_pallas_packed(
        cw, ys, replace(base, allow_short=True),
        w_warm=w0, p_warm=w0, return_dual=True,
    )
    assert struct(i_pkd) == struct(i_fbd)
    assert "dual" in i_pkd and "dual" in i_fbd

    rng = np.random.default_rng(9)
    scen = jnp.asarray(rng.standard_normal((4, 3, 2, 8)) * 0.01, jnp.float32)
    _, s_pk = solve_mpc_log_utility_scenarios_packed(cw, scen, base)
    _, s_fb = solve_mpc_log_utility_scenarios_packed(
        cw, scen, replace(base, allow_short=True)
    )
    assert struct(s_pk) == struct(s_fb)


@pytest.mark.slow
def test_packed_mean_variance_shape_fuzz():
    """MV kernel edge shapes: H=1 (the Markowitz shape, exercises the
    0-size-slice guard), odd asset counts straddling the sublane tile,
    batch below the lane tile."""
    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_mean_variance_pallas_packed

    params = MPCParams(max_iters=600, sigma_scale=2.0, gamma=5.0)
    for seed, (B, H, N) in enumerate([(3, 1, 8), (5, 2, 9), (2, 1, 33)]):
        rng = np.random.default_rng(20 + seed)
        cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
        mu = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
        A = rng.standard_normal((B, N, N)) * 0.05
        Sig = jnp.asarray(
            np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4, jnp.float32
        )
        w, info = solve_mpc_mean_variance_pallas_packed(cw, mu, Sig, params)
        w_np = np.asarray(w)
        assert w_np.shape == (B, H, N)
        assert np.allclose(w_np.sum(-1), 1.0, atol=1e-4), (B, H, N)
        assert np.all(w_np >= -1e-6), (B, H, N)
        w_x, _ = solve_mpc_mean_variance_batch(cw, mu, Sig, params)
        assert np.max(np.abs(w_np - np.asarray(w_x))) < 5e-4, (B, H, N)


def test_packed_scenarios_refresh_schedule():
    """The sweep schedule applies to the scenario kernel too (shared
    factory): refresh=16 must track the full-budget scenario solve."""
    from dataclasses import replace

    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_scenarios_packed

    rng = np.random.default_rng(15)
    B, S, H, N = 5, 4, 3, 10
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    scen = jnp.asarray(rng.standard_normal((B, S, H, N)) * 0.01, jnp.float32)
    base = MPCParams(max_iters=400, sigma_scale=2.0)
    w_full, i_full = solve_mpc_log_utility_scenarios_packed(cw, scen, base)
    w_ref, i_ref = solve_mpc_log_utility_scenarios_packed(
        cw, scen, replace(base, proj_refresh_every=16)
    )
    assert np.max(np.abs(np.asarray(w_full) - np.asarray(w_ref))) < 5e-4
    np.testing.assert_allclose(
        np.asarray(i_ref["objective"]), np.asarray(i_full["objective"]),
        atol=1e-5,
    )


def test_packed_mean_variance_over_relax_matches_xla():
    """MV over-relaxation runs in-kernel and matches the XLA rho path."""
    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_mean_variance_pallas_packed

    rng = np.random.default_rng(17)
    B, H, N = 5, 2, 10
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    A = rng.standard_normal((B, N, N)) * 0.05
    Sig = jnp.asarray(
        np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4, jnp.float32
    )
    p = MPCParams(max_iters=800, sigma_scale=2.0, gamma=5.0, over_relax=1.5)
    w_x, _ = solve_mpc_mean_variance_batch(cw, mu, Sig, p)
    w_pk, i_pk = solve_mpc_mean_variance_pallas_packed(cw, mu, Sig, p)
    assert np.max(np.abs(np.asarray(w_x) - np.asarray(w_pk))) < 5e-5
    assert bool(jnp.all(i_pk["converged"]))


def test_packed_adaptive_matches_xla():
    """Adaptive step sizes run in-kernel: per-problem tau/sigma carried
    through the loop with residual-balancing updates — values must track
    the XLA adaptive path closely."""
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    cw, ys = _instance(B=6, H=5, N=20, seed=8)
    p = MPCParams(max_iters=800, sigma_scale=2.0, adaptive=True)
    w_x, i_x = solve_mpc_log_utility_batch(cw, ys, p)
    w_k, i_k = solve_mpc_log_utility_pallas_packed(
        cw, ys, p, tile_b=128, interpret=True
    )
    assert np.max(np.abs(np.asarray(w_x) - np.asarray(w_k))) < 5e-5
    assert np.max(np.abs(
        np.asarray(i_x["objective"]) - np.asarray(i_k["objective"])
    )) < 1e-5
    assert bool(jnp.all(i_k["converged"]))


def test_packed_mean_variance_adaptive_matches_xla():
    """MV adaptive steps run in-kernel on both Sigma layouts and match
    the XLA adaptive path."""
    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_mean_variance_pallas_packed

    rng = np.random.default_rng(12)
    B, H, N = 6, 4, 10
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    A = rng.standard_normal((B, N, N)) * 0.05
    Sig_b = jnp.asarray(
        np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4, jnp.float32
    )
    Sig_s = jnp.asarray(A[0] @ A[0].T + np.eye(N) * 1e-4, jnp.float32)
    p = MPCParams(max_iters=1200, sigma_scale=2.0, gamma=5.0, adaptive=True)
    for Sig in (Sig_b, Sig_s):
        w_x, _ = solve_mpc_mean_variance_batch(cw, mu, Sig, p)
        w_k, i_k = solve_mpc_mean_variance_pallas_packed(cw, mu, Sig, p)
        assert np.max(np.abs(np.asarray(w_x) - np.asarray(w_k))) < 5e-6
        assert bool(jnp.all(i_k["converged"]))


def test_packed_large_n_mxu_reduction_parity():
    """N >= 256 routes asset-axis reductions through the MXU ones-matmul
    (_sum_assets); the result must still match the XLA scan. Small batch
    and iteration budget keep interpret-mode CPU cost low while
    exercising the dot-based threshold sweeps, portfolio sums, and l1."""
    from kmpc_tpu.ops.mpc import solve_mpc_log_utility_batch
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_log_utility_pallas_packed

    rng = np.random.default_rng(7)
    B, H, N = 3, 2, 260
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, H, N)) * 0.01, jnp.float32)
    p = MPCParams(max_iters=300, sigma_scale=2.0)
    w_x, i_x = solve_mpc_log_utility_batch(cw, ys, p)
    w_pk, i_pk = solve_mpc_log_utility_pallas_packed(cw, ys, p)
    assert np.max(np.abs(np.asarray(w_x) - np.asarray(w_pk))) < 5e-4
    np.testing.assert_allclose(
        np.asarray(i_pk["objective"]), np.asarray(i_x["objective"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(np.asarray(w_pk).sum(-1), 1.0, atol=1e-4)


def test_packed_mv_h1_autotile_and_unroll():
    """The H=1/B>=256 auto-selected 256-lane tile + the 4x-unrolled loop
    (round-3 ADVICE #1 / VERDICT task #3): interpret-mode parity vs the
    XLA solver at a batch that actually exercises the 256 tile, the
    padding gate that refuses it when B pads worse than tb=128 would,
    and unroll-remainder handling for max_iters not divisible by 4."""
    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch
    from kmpc_tpu.ops import mpc_pallas as mp
    from kmpc_tpu.ops.mpc_pallas import solve_mpc_mean_variance_pallas_packed

    rng = np.random.default_rng(21)
    B, N = 260, 10
    cw = jnp.asarray(rng.dirichlet(np.ones(N), size=B), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, 1, N)) * 0.01, jnp.float32)
    A = rng.standard_normal((N, N)) * 0.05
    Sig = jnp.asarray(A @ A.T + np.eye(N) * 1e-4, jnp.float32)
    # max_iters=1202: non-divisible by the unroll factor (remainder path).
    p = MPCParams(max_iters=1202, sigma_scale=2.0, gamma=5.0)

    # B=260 pads to 512 at tb=256 but 384 at tb=128: the gate must pick
    # 128. B=450 pads to 512 either way: the gate must pick 256.
    calls = []
    orig = mp._make_packed_mv_kernel

    def spy(params, H, N_, NP, cold_iters, shared_sigma=False, unroll=1):
        calls.append((H, shared_sigma, unroll))
        return orig(params, H, N_, NP, cold_iters,
                    shared_sigma=shared_sigma, unroll=unroll)

    mp._make_packed_mv_kernel = spy
    try:
        w_pk, i_pk = solve_mpc_mean_variance_pallas_packed(cw, mu, Sig, p)
        w_x, _ = solve_mpc_mean_variance_batch(cw, mu, Sig, p)
        assert np.max(np.abs(np.asarray(w_x) - np.asarray(w_pk))) < 5e-5
        assert bool(jnp.all(i_pk["converged"]))
        assert calls[-1][2] == 4        # H=1 unroll engaged

        B2 = 450
        cw2 = jnp.asarray(rng.dirichlet(np.ones(N), size=B2), jnp.float32)
        mu2 = jnp.asarray(rng.standard_normal((B2, 1, N)) * 0.01,
                          jnp.float32)
        w_pk2, _ = solve_mpc_mean_variance_pallas_packed(cw2, mu2, Sig, p)
        w_x2, _ = solve_mpc_mean_variance_batch(cw2, mu2, Sig, p)
        assert np.max(np.abs(np.asarray(w_x2) - np.asarray(w_pk2))) < 5e-5
    finally:
        mp._make_packed_mv_kernel = orig

    # The tile decision itself (host-side arithmetic, no solve needed).
    def pick(Bq):
        def _pad_to(tb):
            return ((Bq + tb - 1) // tb) * tb
        return 256 if _pad_to(256) == _pad_to(128) else 128

    assert pick(260) == 128 and pick(300) == 128
    assert pick(450) == 256 and pick(4096) == 256 and pick(384) == 128

"""Native C++ solver tests: build, cross-validation vs JAX solver and the
scipy oracle, batch throughput sanity."""

import numpy as np
import pytest

from kmpc_tpu.native import (
    NativeBuildError,
    native_available,
    num_threads,
    solve_mpc_log_utility_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_native_builds_and_reports_threads():
    assert num_threads() >= 1


def test_native_feasibility():
    rng = np.random.default_rng(0)
    H, N = 5, 20
    cw = rng.dirichlet(np.ones(N)).astype(np.float32)
    y = (rng.standard_normal((H, N)) * 0.01).astype(np.float32)
    w, info = solve_mpc_log_utility_native(cw, y, max_iters=2000)
    assert w.shape == (H, N)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-5)
    assert np.all(w >= -1e-6)
    u = np.diff(np.vstack([cw[None], w]), axis=0)
    assert np.all(np.abs(u).sum(-1) <= 0.2 + 1e-3)


def test_native_matches_jax_solver():
    """Same algorithm in C++ (f64) and JAX (f32): solutions agree."""
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch

    rng = np.random.default_rng(1)
    B, H, N = 6, 5, 15
    cw = rng.dirichlet(np.ones(N), size=B).astype(np.float32)
    ys = (rng.standard_normal((B, H, N)) * 0.01).astype(np.float32)

    w_native, _ = solve_mpc_log_utility_native(cw, ys, max_iters=8000)
    params = MPCParams(max_iters=8000, sigma_scale=2.0)
    w_jax, _ = solve_mpc_log_utility_batch(jnp.asarray(cw), jnp.asarray(ys), params)
    assert np.max(np.abs(w_native - np.asarray(w_jax))) < 2e-3


def test_native_matches_oracle_objective():
    import warnings

    warnings.filterwarnings("ignore", message="delta_grad")
    from kmpc_tpu.ops.mpc_oracle import solve_mpc_log_utility_oracle

    rng = np.random.default_rng(2)
    H, N = 5, 12
    cw = rng.dirichlet(np.ones(N))
    y = rng.standard_normal((H, N)) * 0.01
    w_ref, _ = solve_mpc_log_utility_oracle(cw, y)
    w_nat, _ = solve_mpc_log_utility_native(
        cw.astype(np.float32), y.astype(np.float32), max_iters=20000
    )

    def obj(w):
        r = np.exp(y)
        port = (w * r).sum(-1)
        u = np.diff(np.vstack([cw[None], w]), axis=0)
        return np.sum(np.log(port)) - 0.001 * np.abs(u).sum()

    assert obj(w_ref) - obj(w_nat) < 5e-5


def test_native_batch_shapes():
    rng = np.random.default_rng(3)
    B, H, N = 32, 3, 8
    cw = rng.dirichlet(np.ones(N), size=B).astype(np.float32)
    ys = (rng.standard_normal((B, H, N)) * 0.01).astype(np.float32)
    w, _ = solve_mpc_log_utility_native(cw, ys, max_iters=500)
    assert w.shape == (B, H, N)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-4)


def test_native_mean_variance_matches_jax():
    """Native MV solver (double precision, OpenMP over problems) vs the
    JAX solver — independent cross-check of the Markowitz program."""
    import jax.numpy as jnp

    from kmpc_tpu.native import solve_mpc_mean_variance_native
    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_mean_variance_batch

    rng = np.random.default_rng(3)
    B, H, N = 6, 4, 12
    cw = rng.dirichlet(np.ones(N), size=B).astype(np.float32)
    mu = (rng.standard_normal((B, H, N)) * 0.01).astype(np.float32)
    A = rng.standard_normal((B, N, N)) * 0.05
    Sig = (np.einsum("bij,bkj->bik", A, A) + np.eye(N) * 1e-4).astype(
        np.float32
    )
    w_n, info = solve_mpc_mean_variance_native(
        cw, mu, Sig, gamma=5.0, max_iters=4000
    )
    assert info["status"] == "optimal"
    p = MPCParams(max_iters=4000, sigma_scale=2.0, gamma=5.0)
    w_x, _ = solve_mpc_mean_variance_batch(
        jnp.asarray(cw), jnp.asarray(mu), jnp.asarray(Sig), p
    )
    assert np.max(np.abs(w_n - np.asarray(w_x))) < 5e-5
    assert np.allclose(w_n.sum(-1), 1.0, atol=1e-5)
    assert np.all(w_n >= -1e-7)
    # Single-problem + broadcast-Sigma convenience shapes.
    w1, _ = solve_mpc_mean_variance_native(
        cw[0], mu[0], Sig[0], gamma=5.0, max_iters=2000
    )
    assert w1.shape == (H, N)

"""Projection operator tests: optimality conditions + brute-force checks."""

import jax
import jax.numpy as jnp
import numpy as np

from kmpc_tpu.ops.projections import (
    project_hyperplane_sum,
    project_l1_ball,
    project_simplex,
    project_simplex_warm,
    prox_l1_in_ball,
    prox_l1_in_ball_warm,
    soft_threshold,
)


def _rand(shape, seed=0, scale=1.0):
    return scale * jax.random.normal(jax.random.PRNGKey(seed), shape)


def test_simplex_feasibility():
    v = _rand((64, 13), seed=1, scale=3.0)
    w = np.asarray(project_simplex(v))
    assert np.all(w >= 0)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-5)


def test_simplex_projection_is_closest_point():
    """Variational inequality: <v - w, u - w> <= 0 for all feasible u."""
    rng = np.random.default_rng(0)
    v = _rand((16, 8), seed=2, scale=2.0)
    w = np.asarray(project_simplex(v))
    vn = np.asarray(v)
    for _ in range(50):
        u = rng.dirichlet(np.ones(8), size=16)
        inner = np.sum((vn - w) * (u - w), axis=-1)
        assert np.all(inner <= 1e-5)


def test_simplex_idempotent_and_interior_fixed():
    u = jnp.asarray(np.random.default_rng(1).dirichlet(np.ones(10), size=5))
    w = project_simplex(u)
    assert np.allclose(np.asarray(w), np.asarray(u), atol=1e-6)


def test_simplex_radius():
    v = _rand((8, 6), seed=3)
    w = np.asarray(project_simplex(v, radius=2.5))
    assert np.allclose(w.sum(-1), 2.5, atol=1e-5)
    assert np.all(w >= 0)


def test_soft_threshold():
    v = jnp.array([-3.0, -0.5, 0.0, 0.5, 3.0])
    out = np.asarray(soft_threshold(v, 1.0))
    assert np.allclose(out, [-2.0, 0.0, 0.0, 0.0, 2.0])


def test_l1_ball_inside_identity():
    v = jnp.array([[0.1, -0.2, 0.05]])
    out = np.asarray(project_l1_ball(v, 1.0))
    assert np.allclose(out, np.asarray(v))


def test_l1_ball_feasibility_and_optimality():
    v = _rand((32, 9), seed=4, scale=2.0)
    radius = 0.7
    u = np.asarray(project_l1_ball(v, radius))
    l1 = np.abs(u).sum(-1)
    assert np.all(l1 <= radius + 1e-5)
    # Variational inequality against random feasible points.
    rng = np.random.default_rng(2)
    vn = np.asarray(v)
    for _ in range(30):
        z = rng.standard_normal((32, 9))
        z = z / np.abs(z).sum(-1, keepdims=True) * radius * rng.uniform(0, 1)
        inner = np.sum((vn - u) * (z - u), axis=-1)
        assert np.all(inner <= 1e-4)


def test_l1_ball_preserves_signs():
    v = _rand((16, 5), seed=5, scale=2.0)
    u = np.asarray(project_l1_ball(v, 0.3))
    assert np.all(u * np.asarray(v) >= -1e-7)


def test_l1_ball_zero_radius():
    v = _rand((4, 3), seed=6)
    assert np.allclose(np.asarray(project_l1_ball(v, 0.0)), 0.0)


def test_prox_l1_in_ball_composition():
    """prox of c||.||_1 + ind(ball) == shrink then project."""
    v = _rand((8, 7), seed=7, scale=1.5)
    out = np.asarray(prox_l1_in_ball(v, 0.1, 0.5))
    manual = np.asarray(project_l1_ball(soft_threshold(v, 0.1), 0.5))
    assert np.allclose(out, manual)
    assert np.all(np.abs(out).sum(-1) <= 0.5 + 1e-5)


def test_hyperplane_projection():
    v = _rand((6, 4), seed=8)
    w = np.asarray(project_hyperplane_sum(v, 1.0))
    assert np.allclose(w.sum(-1), 1.0, atol=1e-5)
    # Projection moves along the normal only.
    diff = np.asarray(v) - w
    assert np.allclose(diff - diff.mean(-1, keepdims=True), 0.0, atol=1e-6)


def test_simplex_warm_matches_cold_from_any_start():
    """The Michelot threshold step is Newton on a convex piecewise-linear
    equation: one step from ANY theta0 lands at <= theta*, then converges
    monotonically — so a warm start with a small sweep budget must match
    the cold full-budget projection."""
    v = _rand((32, 13), seed=10, scale=3.0)
    w_cold = np.asarray(project_simplex(v))
    for theta0 in (
        jnp.zeros((32, 1)),
        jnp.full((32, 1), -100.0),
        jnp.full((32, 1), +100.0),  # above max(v): clamp path, then recover
    ):
        w_warm, theta = project_simplex_warm(v, 1.0, theta0, 6)
        assert np.allclose(np.asarray(w_warm), w_cold, atol=1e-5)
        assert theta.shape == (32, 1)


def test_simplex_warm_sequence_tracks_moving_input():
    """Carrying theta across slowly-moving inputs (the PDHG setting) stays
    exact with very few sweeps."""
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((16, 10)), jnp.float32)
    # Converge theta once (cold budget), then track with 2 sweeps.
    _, theta = project_simplex_warm(v, 1.0, jnp.zeros((16, 1), jnp.float32), 12)
    for step in range(20):
        v = v + jnp.asarray(rng.standard_normal((16, 10)) * 0.01, jnp.float32)
        w_warm, theta = project_simplex_warm(v, 1.0, theta, 2)
        w_cold = np.asarray(project_simplex(v))
        assert np.allclose(np.asarray(w_warm), w_cold, atol=1e-5), step


def test_prox_l1_in_ball_warm_matches_cold():
    v = _rand((24, 9), seed=11, scale=1.5)
    cold = np.asarray(prox_l1_in_ball(v, 0.1, 0.5))
    warm, theta = prox_l1_in_ball_warm(v, 0.1, 0.5, jnp.zeros((24, 1)), 6)
    assert np.allclose(np.asarray(warm), cold, atol=1e-5)
    # Inside-ball inputs: identity after shrink, any carried theta is fine.
    small = v * 0.01
    cold2 = np.asarray(prox_l1_in_ball(small, 0.001, 10.0))
    warm2, _ = prox_l1_in_ball_warm(small, 0.001, 10.0, theta, 2)
    assert np.allclose(np.asarray(warm2), cold2, atol=1e-6)


def test_projections_jit_and_grad_safe():
    v = _rand((4, 5), seed=9)
    f = jax.jit(lambda x: jnp.sum(project_simplex(x) ** 2))
    g = jax.grad(f)(v)
    assert np.all(np.isfinite(np.asarray(g)))

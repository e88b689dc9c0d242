"""Dynamical-system tests (mirrors reference tests/test_data.py and
test_env_interface.py coverage: integrator correctness vs analytic
solutions, per-system physics, determinism, trajectory shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmpc_tpu.config import Config
from kmpc_tpu.data.systems import (
    generate_sequence_window,
    generate_trajectory,
    integrate_euler,
    integrate_rk4,
    make_system,
    system_dt,
    _SYSTEM_REGISTRY,
)

ALL_SYSTEMS = sorted(_SYSTEM_REGISTRY.keys())


# ---------------------------------------------------------------------------
# Integrators
# ---------------------------------------------------------------------------


def test_euler_linear_decay():
    # dx/dt = -x  => x(dt) ~ x0 (1 - dt)
    x0 = jnp.array([1.0])
    x1 = integrate_euler(x0, 0.01, lambda x: -x)
    assert np.allclose(np.asarray(x1), 1.0 - 0.01, atol=1e-7)


def test_rk4_matches_exponential_decay():
    # RK4 on dx/dt = -x should match exp(-t) to ~dt^4 accuracy.
    dt = 0.1
    x = jnp.array([1.0])
    for _ in range(10):
        x = integrate_rk4(x, dt, lambda x: -x)
    assert np.allclose(np.asarray(x), np.exp(-1.0), atol=1e-6)


def test_rk4_more_accurate_than_euler():
    dt = 0.1
    f = lambda x: -x
    xe = xr = jnp.array([1.0])
    for _ in range(10):
        xe = integrate_euler(xe, dt, f)
        xr = integrate_rk4(xr, dt, f)
    true = np.exp(-1.0)
    assert abs(float(xr[0]) - true) < abs(float(xe[0]) - true)


def test_rk4_harmonic_oscillator_energy():
    # x'' = -x: energy (x^2 + v^2)/2 conserved to high order by RK4.
    def dyn(s):
        return jnp.stack([s[..., 1], -s[..., 0]], axis=-1)

    s = jnp.array([1.0, 0.0])
    for _ in range(1000):
        s = integrate_rk4(s, 0.01, dyn)
    energy = float(jnp.sum(s**2) / 2)
    assert abs(energy - 0.5) < 1e-6


# ---------------------------------------------------------------------------
# System construction & interface
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ALL_SYSTEMS)
def test_make_system_and_shapes(name):
    cfg = Config()
    sys = make_system(cfg, name)
    key = jax.random.PRNGKey(0)
    x0 = sys.reset(key)
    assert x0.shape == (sys.observation_size,)
    x1 = sys.step(x0)
    assert x1.shape == x0.shape
    assert bool(jnp.all(jnp.isfinite(x1)))


@pytest.mark.parametrize("name", ALL_SYSTEMS)
def test_batched_reset_and_step(name):
    cfg = Config()
    sys = make_system(cfg, name)
    key = jax.random.PRNGKey(1)
    x0 = sys.reset(key, batch_size=7)
    assert x0.shape == (7, sys.observation_size)
    # Batch is diverse (independent key splits).
    assert float(jnp.std(x0[:, 0])) > 0
    x1 = sys.step(x0)
    assert x1.shape == x0.shape


@pytest.mark.parametrize("name", ALL_SYSTEMS)
def test_reset_determinism(name):
    cfg = Config()
    sys = make_system(cfg, name)
    a = sys.reset(jax.random.PRNGKey(3), batch_size=4)
    b = sys.reset(jax.random.PRNGKey(3), batch_size=4)
    assert np.allclose(np.asarray(a), np.asarray(b))
    c = sys.reset(jax.random.PRNGKey(4), batch_size=4)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_vectorized_step_matches_individual():
    """Batched step == per-sample step (reference: test_env_interface.py
    vectorized-vs-individual consistency)."""
    cfg = Config()
    for name in ALL_SYSTEMS:
        sys = make_system(cfg, name)
        x0 = sys.reset(jax.random.PRNGKey(5), batch_size=5)
        batched = sys.step(x0)
        individual = jnp.stack([sys.step(x0[i]) for i in range(5)])
        assert np.allclose(np.asarray(batched), np.asarray(individual), atol=1e-6), name


def test_trajectory_shapes_and_reproducibility():
    cfg = Config()
    sys = make_system(cfg, "duffing")
    x0 = sys.reset(jax.random.PRNGKey(0), batch_size=3)
    traj = generate_trajectory(sys.step, x0, 50)
    assert traj.shape == (50, 3, 2)
    traj2 = generate_trajectory(sys.step, x0, 50)
    assert np.allclose(np.asarray(traj), np.asarray(traj2))
    # First step of trajectory equals step(x0)
    assert np.allclose(np.asarray(traj[0]), np.asarray(sys.step(x0)), atol=1e-6)


def test_sequence_window_includes_initial():
    cfg = Config()
    sys = make_system(cfg, "pendulum")
    x0 = sys.reset(jax.random.PRNGKey(0))
    win = generate_sequence_window(sys.step, x0, 10)
    assert win.shape == (11, 2)
    assert np.allclose(np.asarray(win[0]), np.asarray(x0))


def test_sequence_batch_shape():
    cfg = Config()
    sys = make_system(cfg, "duffing")
    seq = sys.sequence_batch(jax.random.PRNGKey(0), batch_size=6, window_length=10)
    assert seq.shape == (6, 11, 2)
    # Consecutive states satisfy the step relation.
    nxt = sys.step(seq[:, 0])
    assert np.allclose(np.asarray(seq[:, 1]), np.asarray(nxt), atol=1e-6)


# ---------------------------------------------------------------------------
# Physics sanity (reference: test_data.py:349-707)
# ---------------------------------------------------------------------------


def test_duffing_fixed_points():
    cfg = Config()
    sys = make_system(cfg, "duffing")
    for fp in ([0.0, 0.0], [1.0, 0.0], [-1.0, 0.0]):
        x = jnp.array(fp)
        nx = sys.step(x)
        assert np.allclose(np.asarray(nx), np.asarray(x), atol=1e-6)


def test_parabolic_attracts_to_manifold():
    cfg = Config()
    sys = make_system(cfg, "parabolic")
    x = jnp.array([0.5, 1.0])
    traj = generate_trajectory(sys.step, x, 500)
    final = np.asarray(traj[-1])
    # Asymptotically x2 -> x1^2
    assert abs(final[1] - final[0] ** 2) < 1e-2


def test_lorenz63_chaotic_divergence():
    cfg = Config()
    sys = make_system(cfg, "lorenz63")
    x = jnp.array([1.0, 1.0, 1.0])
    x_pert = x + 1e-6
    t1 = generate_trajectory(sys.step, x, 2000)
    t2 = generate_trajectory(sys.step, x_pert, 2000)
    d0 = float(jnp.linalg.norm(t1[0] - t2[0]))
    d1 = float(jnp.linalg.norm(t1[-1] - t2[-1]))
    assert d1 > 100 * max(d0, 1e-9)


def test_lotka_volterra_positive_populations():
    cfg = Config()
    sys = make_system(cfg, "lotka_volterra")
    x0 = sys.reset(jax.random.PRNGKey(7), batch_size=10)
    traj = generate_trajectory(sys.step, x0, 500)
    assert float(jnp.min(traj)) > 0.0


def test_lyapunov_attracts_to_equilibrium():
    cfg = Config()
    sys = make_system(cfg, "lyapunov")
    x = jnp.array([1.1, 0.9])
    traj = generate_trajectory(sys.step, x, 2000)
    final = np.asarray(traj[-1])
    # Should settle near the (1, 1) equilibrium.
    assert np.linalg.norm(final - np.array([1.0, 1.0])) < 0.2


def test_pendulum_small_angle_period():
    cfg = Config()
    sys = make_system(cfg, "pendulum")
    # Small oscillation: period ~ 2*pi/sqrt(g/L) = 2*pi/sqrt(9.81)
    x = jnp.array([0.05, 0.0])
    period = 2 * np.pi / np.sqrt(9.81)
    n = int(period / sys.dt)
    traj = generate_trajectory(sys.step, x, n)
    assert np.allclose(np.asarray(traj[-1]), np.asarray(x), atol=5e-3)


# ---------------------------------------------------------------------------
# Factory / registry
# ---------------------------------------------------------------------------


def test_make_system_unknown_raises():
    with pytest.raises(ValueError):
        make_system(Config(), "nope")


def test_system_dt_lookup():
    cfg = Config()
    assert system_dt(cfg, "duffing") == cfg.ENV.DUFFING.DT
    assert system_dt(cfg, "lyapunov") == cfg.ENV.LYAPUNOV.DT
    assert system_dt(cfg, "unknown_env") == 0.01


def test_systems_jittable():
    cfg = Config()
    for name in ALL_SYSTEMS:
        sys = make_system(cfg, name)
        step = jax.jit(sys.step)
        x0 = sys.reset(jax.random.PRNGKey(0), batch_size=2)
        out = step(x0)
        assert out.shape == x0.shape

"""Jittable dynamical-system environments.

TPU-native rebuild of the reference's torch ODE environments
(reference: data.py:19-594). Design divergences, on purpose:

- Each system is a frozen dataclass of *pure functions* ``dynamics(x)`` /
  ``sample_init(key)`` operating on the trailing axis, so every op is
  natively batched: no ``torch.vmap`` wrapper, no per-env Python loops
  (reference VectorWrapper: data.py:95-138).
- Trajectories are ``jax.lax.scan`` over RK4 steps — one compiled program
  for the whole window instead of a T-step Python loop
  (reference: data.py:228-261).
- Randomness uses ``jax.random`` key splitting instead of per-env torch
  Generator seed arithmetic (reference: data.py:102-123); numerical-parity
  tests fix data, not RNG streams (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from kmpc_tpu.config import Config


# ---------------------------------------------------------------------------
# Integrators (reference: data.py:179-225)
# ---------------------------------------------------------------------------


def integrate_euler(x: jax.Array, dt: float, dynamics_fn: Callable) -> jax.Array:
    """Single explicit-Euler step."""
    return x + dt * dynamics_fn(x)


def integrate_rk4(x: jax.Array, dt: float, dynamics_fn: Callable) -> jax.Array:
    """Single classic fourth-order Runge-Kutta step."""
    k1 = dynamics_fn(x)
    k2 = dynamics_fn(x + 0.5 * dt * k1)
    k3 = dynamics_fn(x + 0.5 * dt * k2)
    k4 = dynamics_fn(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


# ---------------------------------------------------------------------------
# System definition
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DynamicalSystem:
    """A continuous-time autonomous system with RK4 discretization.

    ``dynamics`` and ``sample_init`` are pure and broadcast over leading
    batch axes; ``step``/``trajectory`` below close over them and are
    jit/vmap/scan friendly.
    """

    name: str
    dt: float
    observation_size: int
    dynamics: Callable[[jax.Array], jax.Array]
    sample_init: Callable[[jax.Array], jax.Array]  # key -> [observation_size]

    def step(self, x: jax.Array) -> jax.Array:
        """Advance one dt with RK4 (batched over leading axes)."""
        return integrate_rk4(x, self.dt, self.dynamics)

    def reset(self, key: jax.Array, batch_size: Optional[int] = None) -> jax.Array:
        """Sample initial state(s). With ``batch_size`` returns [B, D]."""
        if batch_size is None:
            return self.sample_init(key)
        keys = jax.random.split(key, batch_size)
        return jax.vmap(self.sample_init)(keys)

    def trajectory(self, x0: jax.Array, length: int) -> jax.Array:
        """Roll ``length`` steps; returns [length, ...] (excludes x0).

        Matches the reference's ``generate_trajectory`` contract
        (reference: data.py:228-254).
        """
        return generate_trajectory(self.step, x0, length)

    def sequence_batch(self, key: jax.Array, batch_size: int, window_length: int) -> jax.Array:
        """Batch of windows [B, T+1, D] including the initial state.

        Mirrors VectorWrapper.generate_sequence_batch
        (reference: data.py:140-172) as a single fused reset+scan.
        """
        x0 = self.reset(key, batch_size)                    # [B, D]
        traj = self.trajectory(x0, window_length)           # [T, B, D]
        seq = jnp.concatenate([x0[None], traj], axis=0)     # [T+1, B, D]
        return jnp.swapaxes(seq, 0, 1)                      # [B, T+1, D]


def generate_trajectory(step_fn: Callable, x0: jax.Array, length: int) -> jax.Array:
    """lax.scan trajectory: returns states x_1..x_length, shape [length, ...]."""

    def body(x, _):
        nx = step_fn(x)
        return nx, nx

    _, traj = jax.lax.scan(body, x0, None, length=length)
    return traj


def generate_sequence_window(step_fn: Callable, x0: jax.Array, window_length: int) -> jax.Array:
    """[window_length+1, ...] including x0 (reference: data.py:264-285)."""
    traj = generate_trajectory(step_fn, x0, window_length)
    return jnp.concatenate([x0[None], traj], axis=0)


# ---------------------------------------------------------------------------
# Concrete systems (reference: data.py:293-559)
# ---------------------------------------------------------------------------


def _uniform2(key, lo1, hi1, lo2, hi2):
    k1, k2 = jax.random.split(key)
    x1 = jax.random.uniform(k1, (), minval=lo1, maxval=hi1)
    x2 = jax.random.uniform(k2, (), minval=lo2, maxval=hi2)
    return jnp.stack([x1, x2]).astype(jnp.float32)


def make_pendulum(cfg: Config) -> DynamicalSystem:
    """Free pendulum: x1'' = -(g/L) sin(x1) (reference: data.py:293-328)."""
    g_over_l = 9.81 / 1.0

    def dynamics(x):
        x1, x2 = x[..., 0], x[..., 1]
        return jnp.stack([x2, -g_over_l * jnp.sin(x1)], axis=-1)

    return DynamicalSystem(
        name="pendulum",
        dt=cfg.ENV.PENDULUM.DT,
        observation_size=2,
        dynamics=dynamics,
        sample_init=partial(_uniform2, lo1=-jnp.pi, hi1=jnp.pi, lo2=-2.0, hi2=2.0),
    )


def make_duffing(cfg: Config) -> DynamicalSystem:
    """Unforced Duffing oscillator: x'' = x - x^3 (reference: data.py:331-366)."""

    def dynamics(x):
        x1, x2 = x[..., 0], x[..., 1]
        return jnp.stack([x2, x1 - x1**3], axis=-1)

    return DynamicalSystem(
        name="duffing",
        dt=cfg.ENV.DUFFING.DT,
        observation_size=2,
        dynamics=dynamics,
        sample_init=partial(_uniform2, lo1=-1.5, hi1=1.5, lo2=-1.0, hi2=1.0),
    )


def make_lotka_volterra(cfg: Config) -> DynamicalSystem:
    """Predator-prey, alpha=beta=gamma=delta=0.2 (reference: data.py:369-410)."""
    a = b = g = d = 0.2

    def dynamics(x):
        prey, pred = x[..., 0], x[..., 1]
        return jnp.stack(
            [a * prey - b * prey * pred, d * prey * pred - g * pred], axis=-1
        )

    return DynamicalSystem(
        name="lotka_volterra",
        dt=cfg.ENV.LOTKA_VOLTERRA.DT,
        observation_size=2,
        dynamics=dynamics,
        sample_init=partial(_uniform2, lo1=0.02, hi1=3.0, lo2=0.02, hi2=3.0),
    )


def make_lorenz63(cfg: Config) -> DynamicalSystem:
    """Lorenz '63, sigma=10 rho=28 beta=8/3 (reference: data.py:413-454)."""
    sigma, rho, beta = 10.0, 28.0, 8.0 / 3.0

    def dynamics(s):
        x, y, z = s[..., 0], s[..., 1], s[..., 2]
        return jnp.stack(
            [sigma * (y - x), x * (rho - z) - y, x * y - beta * z], axis=-1
        )

    def sample_init(key):
        base = jnp.array([0.0, 1.0, 1.05], dtype=jnp.float32)
        return base + jax.random.normal(key, (3,), dtype=jnp.float32)

    return DynamicalSystem(
        name="lorenz63",
        dt=cfg.ENV.LORENZ63.DT,
        observation_size=3,
        dynamics=dynamics,
        sample_init=sample_init,
    )


def make_parabolic(cfg: Config) -> DynamicalSystem:
    """Parabolic attractor x2 -> x1^2 (reference: data.py:457-497)."""
    lam = cfg.ENV.PARABOLIC.LAMBDA
    mu = cfg.ENV.PARABOLIC.MU

    def dynamics(x):
        x1, x2 = x[..., 0], x[..., 1]
        return jnp.stack([mu * x1, lam * (x2 - x1**2)], axis=-1)

    return DynamicalSystem(
        name="parabolic",
        dt=cfg.ENV.PARABOLIC.DT,
        observation_size=2,
        dynamics=dynamics,
        sample_init=partial(_uniform2, lo1=-1.0, hi1=1.0, lo2=-1.0, hi2=1.0),
    )


# Equilibria of the Lyapunov multi-attractor field (reference: data.py:520-525).
_LYAPUNOV_POINTS = jnp.array(
    [
        [-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0], [1.0, 1.0],
        [0.0, 0.0],
        [-1.0, -2.0], [1.0, -2.0], [-1.0, 2.0], [1.0, 2.0],
        [-2.0, -1.0], [2.0, -1.0], [-2.0, 1.0], [2.0, 1.0],
    ],
    dtype=jnp.float32,
)


def make_lyapunov(cfg: Config) -> DynamicalSystem:
    """Multi-attractor field from Gaussian bumps (reference: data.py:505-559).

    Written broadcast-style over arbitrary leading batch axes rather than
    per-sample (the reference computes a single state and relies on
    torch.vmap).
    """
    sigma2 = float(cfg.ENV.LYAPUNOV.SIGMA) ** 2

    def dynamics(x):
        # x: [..., 2]; points: [M, 2]
        diff = x[..., None, :] - _LYAPUNOV_POINTS        # [..., M, 2]
        r2 = jnp.sum(diff * diff, axis=-1)               # [..., M]
        normx2 = jnp.sum(x * x, axis=-1, keepdims=True)  # [..., 1]
        bump = jnp.exp(-r2 / sigma2)                     # [..., M]
        psi1 = normx2 * bump                             # [..., M]
        term1 = (-2.0 / sigma2) * jnp.sum(psi1[..., None] * diff, axis=-2)
        term2 = -jnp.sum(bump[..., None] * diff, axis=-2)
        return term1 + term2

    return DynamicalSystem(
        name="lyapunov",
        dt=cfg.ENV.LYAPUNOV.DT,
        observation_size=2,
        dynamics=dynamics,
        sample_init=partial(_uniform2, lo1=-2.5, hi1=2.5, lo2=-2.5, hi2=2.5),
    )


# ---------------------------------------------------------------------------
# Registry and factory (reference: data.py:566-594)
# ---------------------------------------------------------------------------


_SYSTEM_REGISTRY = {
    "pendulum": make_pendulum,
    "duffing": make_duffing,
    "lotka_volterra": make_lotka_volterra,
    "lorenz63": make_lorenz63,
    "parabolic": make_parabolic,
    "lyapunov": make_lyapunov,
}


def make_system(cfg: Config, name: Optional[str] = None) -> DynamicalSystem:
    """Create a system from config (ENV.ENV_NAME unless ``name`` given)."""
    env_name = name if name is not None else cfg.ENV.ENV_NAME
    if env_name not in _SYSTEM_REGISTRY:
        raise ValueError(
            f"Unknown environment '{env_name}'. Available: {list(_SYSTEM_REGISTRY.keys())}"
        )
    return _SYSTEM_REGISTRY[env_name](cfg)


def system_dt(cfg: Config, name: Optional[str] = None) -> float:
    """dt lookup from config (reference: train.py:797-814)."""
    env_name = (name if name is not None else cfg.ENV.ENV_NAME).lower()
    table = {
        "duffing": cfg.ENV.DUFFING.DT,
        "pendulum": cfg.ENV.PENDULUM.DT,
        "lotka_volterra": cfg.ENV.LOTKA_VOLTERRA.DT,
        "lorenz63": cfg.ENV.LORENZ63.DT,
        "parabolic": cfg.ENV.PARABOLIC.DT,
        "lyapunov": cfg.ENV.LYAPUNOV.DT,
    }
    return table.get(env_name, 0.01)

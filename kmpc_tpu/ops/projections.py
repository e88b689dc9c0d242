"""Closed-form projections used by the batched first-order MPC solver.

These replace the constraint handling that the reference delegates to the
CVXPY -> ECOS/SCS interior-point stack (reference: mpc.py:83-100):

  sum(w) = 1, w >= 0      -> Euclidean projection onto the probability simplex
  ||u||_1 <= tau          -> Euclidean projection onto the L1 ball
  soft-threshold          -> prox of the L1 transaction-cost term

All functions are branch-free (sort + cumsum + where), operate on the
trailing axis, broadcast over arbitrary leading batch axes, and are
jit/vmap/grad-safe — so thousands of (date x scenario) problems project
simultaneously on the VPU.

Algorithms: Held-Wolfe-Crowder / Duchi et al. 2008 ("Efficient
projections onto the l1-ball for learning in high dimensions").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _michelot_iters_for(n: int) -> int:
    """Iteration budget for the Michelot threshold at dimension n.

    The active set shrinks monotonically; empirically the fixed point is
    reached in <= ~log2(n)+3 sweeps (measured bitwise-converged at 6 for
    n=30 on solver workloads). Budgets are conservative per size class.
    """
    if n <= 64:
        return 8
    if n <= 256:
        return 12
    return 16


def _simplex_threshold(
    v: jax.Array,
    radius: float,
    num_iters: int | None = None,
    theta0: jax.Array | None = None,
) -> jax.Array:
    """Threshold theta* with sum(max(v - theta*, 0)) == radius, via the
    sort-free Michelot fixed-point iteration:

        theta_{k+1} = (sum_{i in S_k} v_i - radius) / |S_k|,
        S_k = {i : v_i > theta_k},  theta_0 = (sum v - radius)/n.

    This iteration is exactly Newton's method on the convex, decreasing,
    piecewise-linear g(theta) = sum_i max(v_i - theta, 0) - radius (whose
    derivative is -|S|): from ANY starting theta the first step lands at
    the zero of a tangent line, which convexity places at <= theta*, and
    from below convergence is monotone and FINITE (the active set only
    shrinks, at most n times). A fixed ``num_iters`` >= the worst
    active-set path length is therefore exact, and a warm ``theta0``
    (e.g. the previous outer-iteration threshold in a PDHG loop, where v
    moves O(step) per iteration) converges in 2-4 sweeps. Every step is
    a mask + two sums — pure VPU work, no sorts; XLA's TPU sort (the
    classical Held/Duchi projection) is dramatically slower.

    Returns theta with shape v.shape[:-1] + (1,).
    """
    n = v.shape[-1]
    if num_iters is None:
        num_iters = _michelot_iters_for(n)

    # Center by the row max: theta(v - c) = theta(v) - c exactly, and
    # working with O(spread) values instead of O(offset) values avoids
    # catastrophic fp32 cancellation when |v| >> radius.
    vmax = jnp.max(v, axis=-1, keepdims=True)
    vc = v - vmax

    if theta0 is None:
        theta = (jnp.sum(vc, axis=-1, keepdims=True) - radius) / n
    else:
        theta = theta0 - vmax

    def body(_, theta):
        active = vc > theta
        count = jnp.sum(active, axis=-1, keepdims=True).astype(v.dtype)
        s = jnp.sum(jnp.where(active, vc, 0.0), axis=-1, keepdims=True)
        # count >= 1 unless the warm theta started above max(v); the
        # clamp makes that first Newton step finite, after which the
        # max element is active again.
        return (s - radius) / jnp.maximum(count, 1.0)

    theta = jax.lax.fori_loop(0, num_iters, body, theta)
    return theta + vmax


def project_simplex_warm(
    v: jax.Array,
    radius: float,
    theta0: jax.Array,
    num_iters: int,
) -> tuple[jax.Array, jax.Array]:
    """Warm-started simplex projection: returns (w, theta) so an outer
    fixed-point loop (PDHG) can carry theta between iterations and run
    Michelot/Newton for only a few sweeps per projection."""
    theta = _simplex_threshold(v, radius, num_iters=num_iters, theta0=theta0)
    return jnp.maximum(v - theta, 0.0), theta


def prox_l1_in_ball_warm(
    v: jax.Array,
    shrink_t,
    radius: float,
    theta0: jax.Array,
    num_iters: int,
) -> tuple[jax.Array, jax.Array]:
    """Warm-started prox of t*c*||u||_1 + indicator(||u||_1 <= radius);
    returns (u, theta) with theta the (unclamped) ball threshold for the
    next warm start. Matches prox_l1_in_ball exactly at convergence."""
    s = soft_threshold(v, shrink_t)
    a = jnp.abs(s)
    l1 = jnp.sum(a, axis=-1, keepdims=True)
    theta = _simplex_threshold(a, radius, num_iters=num_iters, theta0=theta0)
    projected = jnp.sign(s) * jnp.maximum(a - jnp.maximum(theta, 0.0), 0.0)
    out = jnp.where(l1 <= radius, s, projected)
    return out, theta


def project_simplex(v: jax.Array, radius: float = 1.0) -> jax.Array:
    """Project v (trailing axis) onto {w : w >= 0, sum(w) = radius}.

    Sort-free Michelot threshold iteration (see _simplex_threshold);
    broadcasts over arbitrary leading batch axes. A final exact-sum
    correction spreads the O(n * eps * |v|) float32 cancellation residual
    (visible when |v| >> radius with many tied coordinates) over the
    active set, so the returned sum is exact to ~1 ulp for ANY input.
    """
    theta = _simplex_threshold(v, radius)
    w = jnp.maximum(v - theta, 0.0)
    active = w > 0
    count = jnp.sum(active, axis=-1, keepdims=True).astype(v.dtype)
    s = jnp.sum(w, axis=-1, keepdims=True)
    corr = (radius - s) / jnp.maximum(count, 1.0)
    return jnp.maximum(jnp.where(active, w + corr, 0.0), 0.0)


def soft_threshold(v: jax.Array, threshold) -> jax.Array:
    """prox of t*||.||_1: sign(v) * max(|v| - t, 0)."""
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - threshold, 0.0)


def project_l1_ball(v: jax.Array, radius: float) -> jax.Array:
    """Project v (trailing axis) onto {u : ||u||_1 <= radius}.

    Inside the ball: identity. Outside: soft-threshold with the theta that
    projects |v| onto the simplex of the given radius (Duchi et al. 2008).
    Handles radius == 0 (returns zeros) so tau=0 turnover configs degrade
    gracefully.
    """
    if radius <= 0.0:
        return jnp.zeros_like(v)
    a = jnp.abs(v)
    l1 = jnp.sum(a, axis=-1, keepdims=True)
    inside = l1 <= radius

    theta = jnp.maximum(_simplex_threshold(a, radius), 0.0)
    projected = jnp.sign(v) * jnp.maximum(a - theta, 0.0)
    # Multiplicative exact-radius correction for the float32 cancellation
    # residual at |v| >> radius (sign-preserving, keeps feasibility hard).
    s = jnp.sum(jnp.abs(projected), axis=-1, keepdims=True)
    projected = projected * jnp.minimum(1.0, radius / jnp.maximum(s, 1e-30))
    return jnp.where(inside, v, projected)


def prox_l1_in_ball(v: jax.Array, shrink_t, radius: float) -> jax.Array:
    """prox of  t*c*||u||_1 + indicator(||u||_1 <= radius).

    For this separable-sign composite the prox is soft-threshold followed
    by L1-ball projection (both operations preserve signs and ordering of
    magnitudes, so the composition is exact — see e.g. Yu, "On the
    decomposition of proximal maps", NeurIPS 2013).
    """
    return project_l1_ball(soft_threshold(v, shrink_t), radius)


def project_box(v: jax.Array, lo: float, hi: float) -> jax.Array:
    """Clip to [lo, hi] (used by allow_short variants)."""
    return jnp.clip(v, lo, hi)


def project_hyperplane_sum(v: jax.Array, total: float = 1.0) -> jax.Array:
    """Project onto {w : sum(w) = total} (allow_short: no sign constraint)."""
    n = v.shape[-1]
    shift = (jnp.sum(v, axis=-1, keepdims=True) - total) / n
    return v - shift

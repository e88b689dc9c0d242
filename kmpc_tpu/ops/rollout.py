"""Unified multi-step rollout modes as one lax.scan.

TPU-native rebuild of the reference's three rollout generators
(reference: evaluation.py:44-134): no-reencode, every-step-reencode, and
periodic-k-reencode are a single scan parameterized by
``reencode_period`` (0 = never, 1 = every step, k = periodic), as
anticipated by the reference's own notebook-parity helper
(reference: evaluation.py:731-778).

Explosion handling diverges deliberately: the reference NaN-fills the
remaining horizon for the WHOLE batch once any element is non-finite
(reference: evaluation.py:68-73), because its Python loop cannot mask per
sample cheaply. Here a per-sample ``alive`` mask rides the scan carry:
exploded trajectories freeze and emit NaN while healthy ones continue —
strictly more informative, identical when nothing explodes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from kmpc_tpu.models.koopman import KoopmanModel


def rollout(
    model: KoopmanModel,
    params: Dict,
    x0: jax.Array,
    horizon: int,
    reencode_period: int = 0,
) -> jax.Array:
    """Roll out Koopman dynamics from x0 [batch, obs].

    Args:
        model: static model description.
        params: parameter pytree.
        x0: initial observations [batch, obs].
        horizon: number of prediction steps.
        reencode_period: 0 = latent-only (no reencode), 1 = reencode every
            step, k>1 = reencode every k steps.

    Returns:
        Predictions [horizon, batch, obs] (time-major, matching the
        reference contract; x0 is NOT included).
    """
    z0 = model.encode(params, x0)
    alive0 = jnp.ones(x0.shape[:-1], dtype=bool)

    def body(carry, step):
        z, alive = carry
        nz = model.step_latent(params, z)
        x_pred = model.decode(params, nz)

        finite = jnp.all(jnp.isfinite(x_pred), axis=-1) & alive
        out = jnp.where(finite[..., None], x_pred, jnp.nan)

        if reencode_period == 1:
            nz = model.encode(params, x_pred)
        elif reencode_period > 1:
            # Real branch, not a select: the scan step index is a scalar,
            # so the encoder runs only on reencode steps — (period-1)/period
            # of the encoder passes are skipped entirely. (Under vmap the
            # cond lowers to a select and merely matches the old cost.)
            nz = jax.lax.cond(
                (step + 1) % reencode_period == 0,
                lambda xz: model.encode(params, xz[0]),
                lambda xz: xz[1],
                (x_pred, nz),
            )

        # Freeze exploded samples so overflow doesn't propagate.
        nz = jnp.where(finite[..., None], nz, z)
        return (nz, finite), out

    (_, _), traj = jax.lax.scan(
        body, (z0, alive0), jnp.arange(horizon), length=horizon
    )
    return traj


def rollout_no_reencode(model, params, x0, horizon):
    """Latent-only evolution (reference: evaluation.py:44-74)."""
    return rollout(model, params, x0, horizon, reencode_period=0)


def rollout_every_step_reencode(model, params, x0, horizon):
    """State-space evolution via step_env (reference: evaluation.py:77-99)."""
    return rollout(model, params, x0, horizon, reencode_period=1)


def rollout_periodic_reencode(model, params, x0, horizon, period):
    """Reencode every ``period`` steps (reference: evaluation.py:102-134)."""
    if period <= 0:
        raise ValueError("period must be a positive integer")
    return rollout(model, params, x0, horizon, reencode_period=period)


@partial(jax.jit, static_argnums=(0, 3, 4))
def rollout_jit(model, params, x0, horizon, reencode_period):
    """Jitted entry for repeated evaluation calls."""
    return rollout(model, params, x0, horizon, reencode_period)


def predict_returns(
    model: KoopmanModel,
    params: Dict,
    obs: jax.Array,
    horizon: int,
    n_assets: int,
    mean: jax.Array,
    std: jax.Array,
) -> jax.Array:
    """Koopman H-step return forecast for MPC.

    Mirrors KoopmanMPCStrategy's forecast loop (reference:
    backtest.py:99-121): encode -> H x (step_latent -> decode -> extract
    first n_assets block -> destandardize), but as one scan batched over
    arbitrary leading axes of ``obs`` [..., obs_size].

    Returns predicted raw-scale log-returns [..., horizon, n_assets].
    """
    z0 = model.encode(params, obs)

    def body(z, _):
        nz = model.step_latent(params, z)
        pred_obs = model.decode(params, nz)
        ret = pred_obs[..., :n_assets] * std + mean
        return nz, ret

    _, rets = jax.lax.scan(body, z0, None, length=horizon)
    # [H, ..., n_assets] -> [..., H, n_assets]
    return jnp.moveaxis(rets, 0, -2)

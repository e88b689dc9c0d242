"""Monte-Carlo scenario MPC: stochastic-Kelly over sampled return paths.

BASELINE.json's target workload includes "4096 rolling-window dates x
Monte-Carlo return paths per chip". The reference has no scenario
machinery (its MPC consumes one deterministic forecast per date,
reference: backtest.py:99-124); this module adds it TPU-first:

- :func:`estimate_residual_std` — per-asset, per-lead-time forecast
  residual scale measured on validation data in one batched pass.
- :func:`generate_return_scenarios` — S perturbed forecast paths per
  problem, sampled on-device around the Koopman point forecast.
- :func:`solve_mpc_log_utility_scenarios` — the scenario-averaged Kelly
  program: one weight trajectory maximizing the EXPECTED log growth over
  scenarios. Identical PDHG skeleton to ops/mpc.py; only the smooth
  gradient changes (an average over the scenario axis), so batching over
  (date x anything) leading axes is preserved.

    max_w  (1/S) sum_s sum_t log(w_t . r^s_t) - c sum_t ||u_t||_1
    s.t.   simplex, turnover ball (as in the deterministic program)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from kmpc_tpu.models.koopman import KoopmanModel
from kmpc_tpu.ops.mpc import (
    MPCParams,
    _adaptive_update,
    _apply_D,
    _apply_Dt,
    _pdhg_steps,
    _status_code,
    reject_unhonored_polish,
    restore_turnover_feasibility,
)
from kmpc_tpu.ops.projections import (
    project_hyperplane_sum,
    project_simplex,
    project_simplex_warm,
    prox_l1_in_ball,
    prox_l1_in_ball_warm,
    soft_threshold,
)
from kmpc_tpu.ops.rollout import predict_returns


def estimate_residual_std(
    model: KoopmanModel,
    params: Dict,
    val_data: jax.Array,
    horizon: int,
    n_assets: int,
    mean: jax.Array,
    std: jax.Array,
    max_windows: int = 512,
) -> jax.Array:
    """Per-(lead, asset) std of Koopman forecast residuals on validation
    windows. Returns [horizon, n_assets] (raw log-return scale)."""
    T = val_data.shape[0]
    if T <= horizon:
        raise ValueError(
            f"validation split has {T} rows but residual estimation needs "
            f"more than horizon={horizon} (each window reads truth at "
            "t+1..t+H); pass a longer split or a shorter horizon"
        )
    n = T - horizon
    take = min(n, max_windows)
    step = max(n // take, 1)
    starts = jnp.arange(0, n, step)[:take]
    obs = val_data[starts]                                   # [W, obs]
    preds = predict_returns(model, params, obs, horizon, n_assets, mean, std)
    # Truth: raw-scale returns at t+1..t+H for each window.
    idx = starts[:, None] + 1 + jnp.arange(horizon)[None, :]  # [W, H]
    truth_std = val_data[idx][..., :n_assets]                 # [W, H, N]
    truth = truth_std * std + mean
    resid = preds - truth
    return jnp.std(resid, axis=0)                             # [H, N]


def generate_return_scenarios(
    point_forecast: jax.Array,
    residual_std: jax.Array,
    num_scenarios: int,
    key: jax.Array,
    antithetic: bool = True,
) -> jax.Array:
    """Gaussian scenarios around the point forecast.

    point_forecast: [..., H, N]; residual_std: [H, N] (broadcast).
    Returns [..., S, H, N]. Antithetic pairing halves Monte-Carlo
    variance at no cost (scenario s and s+S/2 use +/- the same draw).
    """
    batch_shape = point_forecast.shape[:-2]
    H, N = point_forecast.shape[-2:]
    if antithetic:
        # ceil so an odd request still yields num_scenarios paths (the
        # unpaired extra draw is simply not mirrored).
        half = (num_scenarios + 1) // 2
        eps = jax.random.normal(key, (*batch_shape, half, H, N),
                                dtype=point_forecast.dtype)
        eps = jnp.concatenate([eps, -eps], axis=-3)[..., :num_scenarios, :, :]
    else:
        eps = jax.random.normal(key, (*batch_shape, num_scenarios, H, N),
                                dtype=point_forecast.dtype)
    return point_forecast[..., None, :, :] + eps * residual_std


def solve_mpc_log_utility_scenarios(
    current_weights: jax.Array,
    scenario_log_returns: jax.Array,
    params: MPCParams,
    w_warm: Optional[jax.Array] = None,
    p_warm: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Scenario-averaged Kelly MPC.

    Args:
        current_weights: [..., N]
        scenario_log_returns: [..., S, H, N]
        w_warm / p_warm: optional warm-start primal/dual iterates
            [..., H, N] (e.g. the previous Jacobi sweep's solution).
    Returns:
        (weights [..., H, N], info) — ONE weight path per problem,
        optimal in expectation over its S scenarios; ``info['dual']``
        carries the final dual for warm continuation.
    """
    reject_unhonored_polish(params, "solve_mpc_log_utility_scenarios")
    r = jnp.exp(scenario_log_returns)                     # [..., S, H, N]
    dtype = r.dtype
    S = r.shape[-3]
    w_init = current_weights.astype(dtype)
    target_shape = (*scenario_log_returns.shape[:-3],
                    *scenario_log_returns.shape[-2:])     # [..., H, N]

    # Lipschitz bound: average of per-scenario bounds (the smooth term's
    # Hessian is the scenario MEAN of per-scenario Hessians).
    r_norm2 = jnp.sum(r * r, axis=-1)
    r_min = jnp.min(r, axis=-1)
    ratio = r_norm2 / jnp.maximum(r_min, 1e-12) ** 2       # [..., S, H]
    if params.precond:
        # Per-horizon-row diagonal steps (see ops/mpc.py::_pdhg_steps);
        # the per-row bound is the scenario mean of per-scenario rows.
        Lt = jnp.mean(ratio, axis=-2) + params.ridge       # [..., H]
        tau_p, sigma = _pdhg_steps(Lt, params)
    else:
        L = (jnp.mean(jnp.max(ratio, axis=-1), axis=-1)[..., None, None]
             + params.ridge)
        sigma = params.sigma_scale * jnp.sqrt(L) / 2.0
        tau_p = params.step_scale / (0.5 * L + sigma * 4.0)
    c = params.cost_coeff
    tau_to = params.max_turnover
    use_ball = tau_to > 0

    def proj_primal(v):
        if params.allow_short:
            return project_hyperplane_sum(v, 1.0)
        return project_simplex(v, 1.0)

    def prox_phi_conj(q, sig):
        if use_ball:
            inner = prox_l1_in_ball(q / sig, c / sig, tau_to)
        else:
            inner = soft_threshold(q / sig, c / sig)
        return q - sig * inner

    def grad_g(w):
        # (1/S) sum_s -r^s / (w . r^s); w broadcast over the scenario axis.
        port = jnp.sum(w[..., None, :, :] * r, axis=-1, keepdims=True)
        g = -r / jnp.maximum(port, 1e-12)
        return jnp.mean(g, axis=-3) + params.ridge * w

    if w_warm is None:
        w0 = jnp.broadcast_to(
            proj_primal(w_init)[..., None, :], target_shape
        ).astype(dtype)
    else:
        w0 = w_warm.astype(dtype)
    p0 = jnp.zeros_like(w0) if p_warm is None else p_warm.astype(dtype)

    warm = params.proj_warm_iters > 0 and not params.allow_short
    rho = params.over_relax

    def body(carry, i):
        w, p, th_w, th_p, tau_c, sig_c, alpha_c = carry
        v = w - tau_c * (grad_g(w) + _apply_Dt(p))
        if warm:
            # Warm-started Michelot/Newton thresholds (see ops/mpc.py).
            w_new, th_w = project_simplex_warm(
                v, 1.0, th_w, params.proj_warm_iters
            )
        else:
            w_new = proj_primal(v)
        w_bar = 2.0 * w_new - w
        q = p + sig_c * _apply_D(w_bar, w_init)
        if warm and use_ball:
            inner, th_p = prox_l1_in_ball_warm(
                q / sig_c, c / sig_c, tau_to, th_p, params.proj_warm_iters
            )
            p_new = q - sig_c * inner
        else:
            p_new = prox_phi_conj(q, sig_c)
        if params.adaptive:
            # Residual balancing, identical to ops/mpc.py's adaptive
            # branch (see MPCParams.adaptive / adapt_every).
            tau_c, sig_c, alpha_c = _adaptive_update(
                i, params, w, w_new, p, p_new, tau_c, sig_c, alpha_c
            )
        if rho != 1.0:
            w_new = w + rho * (w_new - w)
            p_new = p + rho * (p_new - p)
        return (w_new, p_new, th_w, th_p, tau_c, sig_c, alpha_c), None

    th0 = jnp.zeros(w0.shape[:-1] + (1,), dtype)
    xs = (jnp.arange(params.max_iters)
          if params.adaptive and params.adapt_every > 1 else None)
    (w, p, _, _, tau_f, _, _), _ = jax.lax.scan(
        body,
        (w0, p0, th0, th0,
         tau_p.astype(dtype),
         jnp.broadcast_to(sigma, jnp.shape(tau_p)).astype(dtype),
         jnp.full(jnp.shape(tau_p), 0.5, dtype)),
        xs, length=params.max_iters,
    )

    w_last = proj_primal(w - tau_f * (grad_g(w) + _apply_Dt(p)))
    fp_res = jnp.max(jnp.abs(w_last - w), axis=(-2, -1))

    # Feasibility restoration + convergence semantics identical to the
    # deterministic solver (ops/mpc.py:266-291): to_viol reports the
    # pre-restoration slack; restoration makes outputs exactly feasible.
    u_pre = _apply_D(w_last, w_init)
    if use_ball:
        to_viol = jnp.max(
            jnp.maximum(jnp.sum(jnp.abs(u_pre), axis=-1) - tau_to, 0.0),
            axis=-1,
        )
        if params.restore_feasibility:
            w_last = restore_turnover_feasibility(w_last, w_init, tau_to)
    else:
        to_viol = jnp.zeros(w_last.shape[:-2], dtype)

    if use_ball and params.restore_feasibility:
        converged = jnp.isfinite(fp_res)
    else:
        converged = (to_viol <= params.feas_tol) & jnp.isfinite(fp_res)

    failed = ~jnp.isfinite(fp_res)
    hold = jnp.broadcast_to(w_init[..., None, :], w_last.shape)
    w_out = jnp.where(failed[..., None, None], hold, w_last)

    port = jnp.sum(w_out[..., None, :, :] * r, axis=-1)   # [..., S, H]
    exp_log_growth = jnp.mean(
        jnp.sum(jnp.log(jnp.maximum(port, 1e-30)), axis=-1), axis=-1
    )
    u = _apply_D(w_out, w_init)
    objective = exp_log_growth - c * jnp.sum(jnp.abs(u), axis=(-2, -1))

    info = {
        "converged": converged,
        "turnover_violation": to_viol,
        "fixed_point_residual": fp_res,
        "status_code": _status_code(fp_res, params.feas_tol),
        "objective": objective,
        "num_scenarios": S,
        "dual": p,
    }
    return w_out, info

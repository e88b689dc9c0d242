"""Semismooth-Newton polish for the log-utility MPC solver.

First-order (PDHG) iterations identify the optimal active sets quickly
but crawl along the nearly-flat faces of this LP-like objective (the log
term's curvature orthogonal to r_t is ~var(r) ~ 1e-4, so error decays as
(1 - tau*1e-4)^k). This module closes the gap the way OSQP/ReLU-QP do:
once PDHG is in the right neighborhood, a few damped semismooth-Newton
steps on the PDHG fixed-point residual converge superlinearly to
machine-precision KKT points.

Residual map (non-extrapolated PDHG fixed point; zero exactly at the
saddle point):

    R_w(w, p) = w - P( w - tau (grad g(w) + D' p) )
    R_p(w, p) = p - Q( p + sigma (D w - b) )

with P = simplex projection (per horizon row) and
Q(q) = q - sigma * B(q / sigma),  B = proj_{l1-ball(tau_to)} o shrink_{c/sigma}.

Generalized Jacobians (all per-row diag +/- rank-1):

    P'(v)  = diag(a) - a a' / |a|             a = active mask of the projection
    shrink'= diag(s)                          s = |u| > c/sigma
    ball'  = I (inside) or diag(act) - (sgn act)(sgn act)'/|act| (outside)
    Q'     = I - ball' . shrink'

The full Jacobian is a [2HN, 2HN] dense matrix per problem (H*N <= ~256
for every workload config), assembled batched and solved with one
batched LU — MXU work, microseconds per problem. A Levenberg damping
lambda*I keeps degenerate faces (singular J) harmless, and each
problem accepts the Newton result only where the residual actually
decreased (branch-free select), so the polish can never make a solution
worse.

STATUS (measured, see tests/test_mpc_polish.py):
- The Jacobian is exact (machine-precision match with jax.jacfwd of the
  residual map), and in float64 a single Newton step takes the residual
  from ~5e-5 to ~2e-13 — textbook superlinear convergence.
- In float32 the solve is numerically useless on typical instances:
  cond(J) ~ 1e19-1e20 because the KKT system is near-singular along the
  problem's flat faces, and neither equilibration nor Levenberg damping
  recovers a usable step at f32 precision. The branch-free acceptance
  test then (correctly) rejects every step, so the polish is a no-op on
  TPU float32.
- More fundamentally: on degenerate instances the PDHG iterate sits at
  residual ~1e-4 yet 1e-1 away (in weights) from the oracle's solution —
  both are epsilon-optimal points on the SAME optimal face. Newton
  converges to the nearest fixed point, not the oracle's, so weight-
  parity tails on such instances are unresolvable by ANY polish (two
  interior-point solvers disagree the same way).
Use this module in float64 host mode when machine-precision KKT points
are needed on non-degenerate problems; the default TPU path relies on
PDHG iterations + exact feasibility restoration instead.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from kmpc_tpu.ops.mpc import (
    MPCParams,
    _apply_D,
    _apply_Dt,
    _log_utility_objective,
    restore_turnover_feasibility,
)
from kmpc_tpu.ops.projections import _simplex_threshold


def _proj_simplex_with_jac(v):
    """Simplex projection per trailing row + its generalized Jacobian.

    v: [..., H, N] -> (P(v) [..., H, N], active mask a [..., H, N]).
    Jacobian action: J_P x = a*x - a * (a.x)/|a|.
    """
    theta = _simplex_threshold(v, 1.0)
    w = jnp.maximum(v - theta, 0.0)
    active = (v - theta > 0.0).astype(v.dtype)
    return w, active


def _apply_P_jac(active, x):
    """Apply P'(v) = diag(a) - a a'/|a| row-wise to x [..., H, N]."""
    cnt = jnp.maximum(jnp.sum(active, axis=-1, keepdims=True), 1.0)
    ax = active * x
    return ax - active * (jnp.sum(ax, axis=-1, keepdims=True) / cnt)


def _Q_with_jac(q, sigma, c, tau_to):
    """Dual prox Q(q) and the masks needed for Q' (see module docstring)."""
    u = q / sigma
    s = (jnp.abs(u) > c / sigma).astype(q.dtype)
    y = jnp.sign(u) * jnp.maximum(jnp.abs(u) - c / sigma, 0.0)
    if tau_to > 0:
        a = jnp.abs(y)
        l1 = jnp.sum(a, axis=-1, keepdims=True)
        theta = jnp.maximum(_simplex_threshold(a, tau_to), 0.0)
        z_out = jnp.sign(y) * jnp.maximum(a - theta, 0.0)
        outside = (l1 > tau_to).astype(q.dtype)
        z = jnp.where(outside > 0, z_out, y)
        act = (a - theta > 0.0).astype(q.dtype) * outside + s * (1.0 - outside)
        sgn = jnp.sign(y) * act
    else:
        z = y
        outside = jnp.zeros_like(q[..., :1])
        act = s
        sgn = jnp.zeros_like(q)
    Q = q - sigma * z
    return Q, s, act, sgn, outside


def _apply_B_jac(s, act, sgn, outside, x):
    """Apply B' = ball' . shrink' row-wise to x.

    shrink' x = s*x ; ball' (inside) = I, (outside):
    diag(act) - sgn sgn'/|act|.
    """
    sx = s * x
    cnt = jnp.maximum(jnp.sum(act, axis=-1, keepdims=True), 1.0)
    proj = act * sx - sgn * (jnp.sum(sgn * sx, axis=-1, keepdims=True) / cnt)
    return jnp.where(outside > 0, proj, sx)


def polish_log_utility(
    w: jax.Array,
    p: jax.Array,
    current_weights: jax.Array,
    predicted_log_returns: jax.Array,
    params: MPCParams,
    num_newton: int = 4,
    damping: float = 1e-7,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Damped semismooth-Newton refinement of a PDHG iterate.

    Args:
        w, p: primal/dual iterates [..., H, N] from the PDHG solver.
        current_weights: [..., N]; predicted_log_returns: [..., H, N].
    Returns:
        (w_polished, info) — per-problem ``residual_before/after``, an
        ``accepted`` mask, and ``info['dual']``: the polished dual
        iterate (so callers can thread the Newton rounds' dual progress
        into a warm-started PDHG continuation instead of restarting from
        the stale pre-polish dual). Rejected problems keep their input
        w and p exactly.
    """
    H, N = predicted_log_returns.shape[-2:]
    m = H * N
    dtype = predicted_log_returns.dtype
    batch_shape = predicted_log_returns.shape[:-2]

    r = jnp.exp(predicted_log_returns)
    w_init = current_weights.astype(dtype)

    r_norm2 = jnp.sum(r * r, axis=-1)
    r_min = jnp.min(r, axis=-1)
    L = jnp.max(r_norm2 / jnp.maximum(r_min, 1e-12) ** 2, axis=-1)
    L = L[..., None, None] + params.ridge
    sigma = params.sigma_scale * jnp.sqrt(L) / 2.0
    tau = params.step_scale / (0.5 * L + sigma * 4.0)
    c = params.cost_coeff
    tau_to = params.max_turnover

    def residual_and_masks(w, p):
        port = jnp.sum(w * r, axis=-1, keepdims=True)
        grad = -r / jnp.maximum(port, 1e-12) + params.ridge * w
        vw = w - tau * (grad + _apply_Dt(p))
        Pw, a = _proj_simplex_with_jac(vw)
        Rw = w - Pw
        vp = p + sigma * _apply_D(w, w_init)
        Qp, s, act, sgn, outside = _Q_with_jac(vp, sigma, c, tau_to)
        Rp = p - Qp
        masks = (a, s, act, sgn, outside, port, grad)
        return Rw, Rp, masks

    def hess_g_apply(port, x):
        """H_g x per row: (r r' / port^2) x + ridge x."""
        coeff = jnp.sum(r * x, axis=-1, keepdims=True) / jnp.maximum(port, 1e-12) ** 2
        return r * coeff + params.ridge * x

    def jac_apply(masks, xw, xp):
        """Apply the full Jacobian J to (xw, xp)."""
        a, s, act, sgn, outside, port, _ = masks
        # d vw = xw - tau (Hg xw + D' xp)
        dvw = xw - tau * (hess_g_apply(port, xw) + _apply_Dt(xp))
        Jw = xw - _apply_P_jac(a, dvw)
        # d vp = xp + sigma D xw ; Q' dvp = dvp - B'(dvp)
        dvp = xp + sigma * _apply_D(xw, jnp.zeros_like(w_init))
        Jp = xp - (dvp - _apply_B_jac(s, act, sgn, outside, dvp))
        return Jw, Jp

    def build_dense_J(masks):
        """Materialize J [.., 2m, 2m] by applying it to basis vectors.

        Vectorized: apply to the identity [2m] basis as one batched call
        (jac_apply broadcasts over an extra leading axis).
        """
        eye = jnp.eye(2 * m, dtype=dtype)                       # [2m, 2m]
        ew = eye[:, :m].reshape(2 * m, H, N)
        ep = eye[:, m:].reshape(2 * m, H, N)

        def one(col_w, col_p):
            bw = jnp.broadcast_to(col_w, batch_shape + (H, N))
            bp = jnp.broadcast_to(col_p, batch_shape + (H, N))
            Jw, Jp = jac_apply(masks, bw, bp)
            return jnp.concatenate(
                [Jw.reshape(batch_shape + (m,)), Jp.reshape(batch_shape + (m,))],
                axis=-1,
            )

        cols = jax.vmap(one)(ew, ep)                            # [2m, ..., 2m]
        # -> [..., 2m(out), 2m(in)]
        return jnp.moveaxis(cols, 0, -1)

    accepted_any = jnp.zeros(batch_shape, bool)
    Rw0, Rp0, _ = residual_and_masks(w, p)
    res0 = jnp.sqrt(
        jnp.sum(Rw0**2, axis=(-2, -1)) + jnp.sum(Rp0**2, axis=(-2, -1))
    )

    w_cur, p_cur = w, p
    for _ in range(num_newton):
        Rw, Rp, masks = residual_and_masks(w_cur, p_cur)
        res = jnp.sqrt(
            jnp.sum(Rw**2, axis=(-2, -1)) + jnp.sum(Rp**2, axis=(-2, -1))
        )
        J = build_dense_J(masks)
        Jd = J + damping * jnp.eye(2 * m, dtype=dtype)
        rhs = -jnp.concatenate(
            [Rw.reshape(batch_shape + (m,)), Rp.reshape(batch_shape + (m,))],
            axis=-1,
        )
        delta = jnp.linalg.solve(Jd, rhs[..., None])[..., 0]    # [..., 2m]
        dw = delta[..., :m].reshape(w_cur.shape)
        dp = delta[..., m:].reshape(p_cur.shape)

        # Backtracking line search, branch-free: evaluate the residual at
        # a fixed ladder of step sizes and keep the per-problem best. The
        # full step's quadratic basin is tiny when the active set is
        # about to change (semismooth kink crossings); shorter steps walk
        # the iterate into the basin, after which a later full step
        # converges superlinearly.
        res_best = res
        w_best, p_best = w_cur, p_cur
        for alpha in (1.0, 0.5, 0.25, 0.125, 0.0625):
            w_try = w_cur + alpha * dw
            p_try = p_cur + alpha * dp
            Rw_t, Rp_t, _ = residual_and_masks(w_try, p_try)
            res_t = jnp.sqrt(
                jnp.sum(Rw_t**2, axis=(-2, -1))
                + jnp.sum(Rp_t**2, axis=(-2, -1))
            )
            better = jnp.isfinite(res_t) & (res_t < res_best)
            sel = better[..., None, None]
            w_best = jnp.where(sel, w_try, w_best)
            p_best = jnp.where(sel, p_try, p_best)
            res_best = jnp.where(better, res_t, res_best)
        ok = res_best < res
        accepted_any = accepted_any | ok
        w_cur, p_cur = w_best, p_best

    # Final projection maps polished primal-dual iterates back to a
    # primal-feasible point; problems where every Newton step was
    # rejected keep their INPUT w exactly (the docstring contract) —
    # an extra PDHG half-step would silently discard the caller's
    # turnover-feasibility restoration without improving the residual.
    port = jnp.sum(w_cur * r, axis=-1, keepdims=True)
    grad = -r / jnp.maximum(port, 1e-12) + params.ridge * w_cur
    vw = w_cur - tau * (grad + _apply_Dt(p_cur))
    w_proj, _ = _proj_simplex_with_jac(vw)
    w_out = jnp.where(accepted_any[..., None, None], w_proj, w)
    p_out = jnp.where(accepted_any[..., None, None], p_cur, p)

    Rw_f, Rp_f, _ = residual_and_masks(w_cur, p_cur)
    res_f = jnp.sqrt(
        jnp.sum(Rw_f**2, axis=(-2, -1)) + jnp.sum(Rp_f**2, axis=(-2, -1))
    )
    info = {
        "residual_before": res0,
        "residual_after": res_f,
        "accepted": accepted_any,
        "dual": p_out,
    }
    return w_out, info


def solve_mpc_log_utility_batch_polished(
    current_weights: jax.Array,
    predicted_log_returns: jax.Array,
    params: MPCParams,
    cycles: int = 3,
    continue_iters: Optional[int] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Verified solve: PDHG + float64 host (PDHG <-> Newton) alternation.

    This is the verification path ``cfg.MPC.SOLVER.POLISH=True`` selects
    (via ``MPCParams.polish``): the batched PDHG solve runs as usual
    (float32, wherever the caller's arrays live), then on the CPU host
    in float64 the iterate alternates ``cycles`` rounds of semismooth-
    Newton polish and warm-started PDHG continuation. The alternation is
    what makes the Newton step reliable: a single polish stalls on
    iterates whose active set is still moving (its quadratic basin is
    tiny near kink crossings), but each PDHG continuation re-identifies
    the active set and hands the next Newton round a closer point.
    Measured on the H=5/N=30 ridge=1e-3 instance family: 3 cycles take
    100% of instances to fixed-point residual ~1e-16 — a machine-
    precision KKT certificate — where one polish alone converges ~50%
    (see RESULTS.md "Measured parity CDF"; at those certificates the
    polished solutions strictly dominate scipy trust-constr's objective
    on every instance tried).

    Returns float64 weights (turnover-restored when
    ``params.restore_feasibility``, like every solver in this package)
    and an info dict whose ``objective``, ``converged``,
    ``turnover_violation``, and ``dual`` are recomputed from the
    POLISHED iterate, augmented with the final polish's
    ``residual_before/after``/``accepted``. (``fixed_point_residual``
    remains the initial float32 PDHG solve's diagnostic; the verified
    path's convergence measure is ``residual_after``.) Not a hot-path
    function: use it for parity studies, oracle comparisons, and
    anywhere machine-precision KKT points matter more than throughput.
    """
    import numpy as np
    from dataclasses import replace

    from kmpc_tpu.ops.mpc import solve_mpc_log_utility_batch

    # THIS function honors params.polish; the inner batch solves must not
    # see the flag (they would refuse it — reject_unhonored_polish).
    params = replace(params, polish=False)
    w, info = solve_mpc_log_utility_batch(
        current_weights, predicted_log_returns, params
    )
    w_np = np.asarray(w, dtype=np.float64)
    p_np = np.asarray(info["dual"], dtype=np.float64)
    cw_np = np.asarray(current_weights, dtype=np.float64)
    y_np = np.asarray(predicted_log_returns, dtype=np.float64)
    if continue_iters is None:
        continue_iters = max(500, params.max_iters // 2)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), jax.enable_x64(True):
        cw64 = jnp.asarray(cw_np)
        y64 = jnp.asarray(y_np)
        w_cur = jnp.asarray(w_np)
        p_cur = jnp.asarray(p_np)
        cont = replace(params, max_iters=continue_iters)
        pol_info = None
        for cycle in range(max(1, cycles)):
            w_cur, pol_info = polish_log_utility(
                w_cur, p_cur, cw64, y64, params,
                num_newton=params.polish_newton,
            )
            # Thread the Newton rounds' dual progress into the
            # continuation (restarting from the pre-polish dual would
            # re-derive work each PDHG continuation already paid for).
            p_cur = pol_info["dual"]
            if cycle + 1 < cycles:
                w_cur, cinfo = solve_mpc_log_utility_batch(
                    cw64, y64, cont, w_warm=w_cur, p_warm=p_cur
                )
                p_cur = cinfo["dual"]
        w_pol = w_cur

        # Recompute the diagnostics the caller consumes from the
        # POLISHED iterate — the PDHG info described the discarded f32
        # iterate — and re-apply the exact turnover restoration so the
        # ``restore_feasibility`` contract ("outputs strictly feasible")
        # holds for the returned weights too (the polish tail projects
        # to the simplex only).
        tau_to = params.max_turnover
        if tau_to > 0:
            u_pre = w_pol - jnp.concatenate(
                [cw64[..., None, :], w_pol[..., :-1, :]], axis=-2
            )
            to_viol = jnp.max(
                jnp.maximum(jnp.sum(jnp.abs(u_pre), axis=-1) - tau_to, 0.0),
                axis=-1,
            )
            if params.restore_feasibility:
                w_pol = restore_turnover_feasibility(w_pol, cw64, tau_to)
        else:
            to_viol = jnp.zeros(w_pol.shape[:-2], w_pol.dtype)
        finite = jnp.all(jnp.isfinite(w_pol), axis=(-2, -1)) & jnp.isfinite(
            pol_info["residual_after"]
        )
        if tau_to > 0 and params.restore_feasibility:
            converged = finite
        else:
            converged = finite & (to_viol <= params.feas_tol)
        objective = _log_utility_objective(
            w_pol, jnp.exp(y64), cw64, params.cost_coeff
        )
        w_pol.block_until_ready()
    out_info = dict(info)
    out_info.update(pol_info)     # incl. the polished dual
    out_info["objective"] = objective
    out_info["converged"] = converged
    out_info["turnover_violation"] = to_viol
    return w_pol, out_info

"""Pallas-fused PDHG log-utility MPC solver (VMEM-resident iterates).

One `pallas_call` runs the ENTIRE solve: the grid tiles the problem
batch, each program pulls its [TB, H, LANES] chunk into VMEM once and
runs all PDHG iterations (including the warm-started Michelot projection
sweeps) on VMEM-resident values — zero HBM traffic between iterations.
Numerics match ops/mpc.py's XLA-scan solver (same iteration, same
projections, same warm-threshold scheme).

Layout: assets are padded to a multiple of the 128-lane dimension; the
horizon rides the sublane dimension. Padded lanes carry r = 0 / w = 0
and are excluded from projections via an additive -inf mask, so they can
never enter an active set.

Performance status (v5e, measured, warm thresholds in both paths):

- Small N (the H=5/N=30 headline): the XLA-scan solver remains FASTER.
  With N=30 padded to 128 lanes the kernel wastes 4.3x of every VPU op,
  while XLA packs the batch densely; per-op parallelism, not memory
  traffic, binds at these sizes. Use ``solve_mpc_log_utility_batch``
  (~9.6x the 10k solves/s/chip target on its own). The known fix is
  lane-packing 4 problems x 32 assets per 128-lane row.
- Large N (N >= ~128, e.g. the 500-asset universe): lanes are naturally
  full and the XLA path's working set blows past VMEM, so it pays HBM
  round-trips for the scan carry AND materialized intermediates every
  iteration. Keeping the iterates VMEM-resident is the win this kernel
  targets; see RESULTS.md for measured numbers.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmpc_tpu.ops.mpc import (
    MPCParams,
    _log_utility_objective,
    restore_turnover_feasibility,
)

_LANE = 128
_NEG = -1e30


def _masked_simplex_threshold(v, neg_mask, radius, num_iters, theta0=None):
    """Michelot/Newton threshold over the lane axis with padded lanes
    disabled. Matches ops/projections.py:_simplex_threshold; ``theta0``
    warm-starts the iteration (globally convergent from any start).

    v: [..., LANES]; neg_mask: 0 for valid lanes, -inf for padded.
    """
    vm = v + neg_mask                                     # padded -> -inf
    if theta0 is None:
        valid = (neg_mask == 0.0).astype(v.dtype)
        n = jnp.sum(valid, axis=-1, keepdims=True)
        v0 = jnp.where(neg_mask == 0.0, v, 0.0)
        theta = (jnp.sum(v0, axis=-1, keepdims=True) - radius) / n
    else:
        theta = theta0

    def body(_, theta):
        active = vm > theta
        count = jnp.sum(active.astype(v.dtype), axis=-1, keepdims=True)
        s = jnp.sum(jnp.where(active, v, 0.0), axis=-1, keepdims=True)
        return (s - radius) / jnp.maximum(count, 1.0)

    return jax.lax.fori_loop(0, num_iters, body, theta)


def _make_kernel(params: MPCParams, H: int, cold_iters: int):
    c = params.cost_coeff
    tau_to = params.max_turnover
    use_ball = tau_to > 0
    ridge = params.ridge
    warm_iters = max(params.proj_warm_iters, 1)

    def kernel(cw_ref, r_ref, negmask_ref, out_ref):
        r = r_ref[:]                                       # [TB, H, LANES]
        w_init = cw_ref[:]                                 # [TB, LANES]
        neg_mask = negmask_ref[:]                          # [1, LANES]
        nm3 = neg_mask[None, :, :]                         # [1, 1, LANES]

        valid = (neg_mask == 0.0).astype(r.dtype)          # [1, LANES]

        # Per-problem Lipschitz bound (padded lanes carry r = 0).
        r_norm2 = jnp.sum(r * r, axis=-1)                  # [TB, H]
        r_big = jnp.where(nm3 == 0.0, r, jnp.inf)
        r_min = jnp.min(r_big, axis=-1)                    # [TB, H]
        L = jnp.max(r_norm2 / jnp.maximum(r_min, 1e-12) ** 2, axis=-1)
        L = L[:, None, None] + ridge
        sigma = params.sigma_scale * jnp.sqrt(L) / 2.0
        tau_p = params.step_scale / (0.5 * L + sigma * 4.0)

        def proj_simplex(v, theta0, n_sweeps):
            theta = _masked_simplex_threshold(
                v, nm3, 1.0, n_sweeps, theta0=theta0
            )
            return jnp.maximum(v + nm3 - theta, 0.0), theta

        def apply_D(w):
            prev = jnp.concatenate([w_init[:, None, :], w[:, :-1, :]], axis=1)
            return w - prev

        def apply_Dt(p):
            nxt = jnp.concatenate(
                [p[:, 1:, :], jnp.zeros_like(p[:, :1, :])], axis=1
            )
            return p - nxt

        def prox_phi_conj(q, sig, theta0, n_sweeps):
            v = q / sig
            inner = jnp.sign(v) * jnp.maximum(jnp.abs(v) - c / sig, 0.0)
            theta = theta0
            if use_ball:
                a = jnp.abs(inner)
                l1 = jnp.sum(jnp.where(nm3 == 0.0, a, 0.0), axis=-1, keepdims=True)
                theta = _masked_simplex_threshold(
                    a, nm3, tau_to, n_sweeps, theta0=theta0
                )
                proj = jnp.sign(inner) * jnp.maximum(
                    a - jnp.maximum(theta, 0.0), 0.0
                )
                inner = jnp.where(l1 <= tau_to, inner, proj)
            return q - sig * inner, theta

        w0, th_w0 = proj_simplex(
            jnp.broadcast_to(w_init[:, None, :], r.shape), None, cold_iters
        )
        p0 = jnp.zeros_like(w0)
        th_p0 = jnp.zeros_like(th_w0)

        def body(_, carry):
            w, p, th_w, th_p = carry
            port = jnp.sum(w * r, axis=-1, keepdims=True)
            grad = -r / jnp.maximum(port, 1e-12) + ridge * w
            w_new, th_w = proj_simplex(
                w - tau_p * (grad + apply_Dt(p)), th_w, warm_iters
            )
            w_bar = 2.0 * w_new - w
            p_new, th_p = prox_phi_conj(
                p + sigma * apply_D(w_bar), sigma, th_p, warm_iters
            )
            return (w_new, p_new, th_w, th_p)

        w, p, _, _ = jax.lax.fori_loop(
            0, params.max_iters, body, (w0, p0, th_w0, th_p0)
        )
        out_ref[:] = w * valid[None, :, :]

    return kernel


def _default_tile_b(H: int, lanes: int) -> int:
    """Largest power-of-two tile whose working set (~8 live [TB, H, LANES]
    f32 arrays) stays within ~12 MB of the ~16 MB/core VMEM."""
    budget = 4 * 1024 * 1024  # tb=128 at H=5/lanes=512 already overflows
                              # VMEM (measured HTTP-500 compile failure);
                              # ~4 MB of declared arrays leaves headroom
                              # for Mosaic temporaries, and tb=32 measured
                              # fastest at lanes=512 anyway (7.2k vs 7.0k
                              # solves/s at tb=64)
    per_problem = H * lanes * 4 * 8
    tb = 8
    while tb * 2 * per_problem <= budget and tb < 1024:
        tb *= 2
    return tb


def solve_mpc_log_utility_pallas(
    current_weights: jax.Array,
    predicted_log_returns: jax.Array,
    params: MPCParams,
    tile_b: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Fused-solve wrapper: [B, N] x [B, H, N] -> ([B, H, N], info).

    The batch is padded to a multiple of ``tile_b`` and assets to a
    multiple of 128 lanes; results come back unpadded. Honors
    ``params.restore_feasibility`` (restoration runs outside the kernel,
    once). Gradient flow is not supported (solver output, not a
    training path).
    """
    B, H, N = predicted_log_returns.shape
    lanes = ((N + _LANE - 1) // _LANE) * _LANE
    dtype = jnp.float32
    if tile_b is None:
        tile_b = _default_tile_b(H, lanes)

    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    r = jnp.exp(predicted_log_returns).astype(dtype)
    r_pad = jnp.zeros((Bp, H, lanes), dtype)
    r_pad = r_pad.at[:B, :, :N].set(r)
    cw_pad = jnp.zeros((Bp, lanes), dtype)
    cw_pad = cw_pad.at[:B, :N].set(current_weights.astype(dtype))
    neg_mask = jnp.where(
        jnp.arange(lanes)[None, :] < N, 0.0, _NEG
    ).astype(dtype)                                        # [1, LANES]

    # Cold budget for the initial projection, matching projections.py.
    cold_iters = 8 if N <= 64 else (12 if N <= 256 else 16)
    kernel = _make_kernel(params, H, cold_iters)
    grid = (Bp // tile_b,)

    w_pad = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, H, lanes), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, H, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(cw_pad, r_pad, neg_mask)

    w = w_pad[:B, :, :N]
    w_init = current_weights.astype(dtype)
    if params.max_turnover > 0 and params.restore_feasibility:
        w = restore_turnover_feasibility(w, w_init, params.max_turnover)
    info = {
        "objective": _log_utility_objective(w, r, w_init, params.cost_coeff),
        "converged": jnp.all(jnp.isfinite(w), axis=(-2, -1)),
    }
    return w, info

"""Pallas-fused PDHG log-utility MPC solvers (VMEM-resident iterates).

One `pallas_call` runs the ENTIRE solve: the grid tiles the problem
batch, each program pulls its chunk into VMEM once and runs all PDHG
iterations (including the warm-started Michelot projection sweeps) on
VMEM-resident values — zero HBM traffic between iterations. Numerics
match ops/mpc.py's XLA-scan solver (same iteration, same projections,
same warm-threshold scheme).

Layout (v5e, measured at 1000 iterations, warm thresholds in all
paths): ``solve_mpc_log_utility_pallas_packed`` — batch-in-lanes.
The problem batch rides the 128-lane axis (always full), assets ride
sublanes (N=30 -> 32, 1.07x pad), the horizon is the leading untiled
axis; asset reductions are sublane reductions (small N) or MXU
ones-matmuls (N >= 256, see _sum_assets). Beats the XLA scan
everywhere: 156k vs 94k solves/s on the H=5/N=30 headline (the scan
is HBM-bound there: ~8 arrays x B*H*N*4B >> 16 MB VMEM round-trip
every iteration), 41.8k vs 28.0k at H=20, 11.6k vs 6.9k at N=500,
94.7k vs 66k at matched 500 iterations on the S=16 scenario-Kelly
program (``solve_mpc_log_utility_scenarios_packed``; 64.2k at the
1000-iteration bench setting). An earlier assets-in-lanes layout
(padding N=30 to 128 lanes: 6.8x VPU waste) lost everywhere and was
retired — measurements preserved in RESULTS.md.

Padded rows/lanes carry r = 0 / w = 0 and are excluded from projections
via an additive -inf mask, so they can never enter an active set.

Parameter surface and failure semantics match the XLA solver:
``allow_short`` delegates to ``solve_mpc_log_utility_batch`` (the
kernels implement only the simplex projection), ``over_relax`` runs
in-kernel (rho-relaxed iterates, the XLA recursion), ``proj_warm_iters=0``
runs cold full-budget projections, non-finite solves fall back to
hold-current-weights
(reference: mpc.py:113-116), and ``info`` reports the pre-restoration
``turnover_violation``. The kernels end with the same extra primal
half-step as the XLA tail (ops/mpc.py:270-274): the returned iterate is
``w_last`` and ``info['fixed_point_residual']`` is max|w_last - w|,
computed in-kernel, so the diagnostics and the hold-weights trigger are
the identical quantities on both paths. Workloads whose working set
cannot fit VMEM at the minimum 128-lane tile (e.g. S=16 x N=500) also
delegate to the XLA scan instead of failing the compile.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmpc_tpu.ops.mpc import (
    MPCParams,
    _balance_steps,
    _log_utility_objective,
    _status_code,
    reject_unhonored_polish,
    restore_turnover_feasibility,
    solve_mpc_log_utility_batch,
)

_LANE = 128
_NEG = -1e30


def _needs_xla_fallback(params: MPCParams) -> bool:
    """Parameter combinations the fused kernels do not implement.

    ``allow_short`` needs the hyperplane (not simplex) projection;
    rather than silently solving a DIFFERENT program, the wrappers
    delegate it to the XLA-scan solver, which supports the full
    parameter surface. (``over_relax`` is implemented in-kernel.)"""
    return params.allow_short


# ---------------------------------------------------------------------------
# Batch-in-lanes ("packed") kernel
# ---------------------------------------------------------------------------
#
# Layout: the PROBLEM BATCH rides the 128-lane axis (always full),
# assets ride the sublane axis (N=30 -> 32, 1.07x waste), and the
# horizon is the leading (untiled) axis. Asset reductions become
# sublane reductions; everything stays VMEM-resident for the whole
# solve, removing the ~30 MB/iteration HBM round-trip that binds the
# XLA scan at batch 8192 (working set ~8 arrays x B*H*N*4B >> 16 MB
# VMEM). Measured on v5e: 156k solves/s on the H=5/N=30 headline vs
# 94k for the XLA scan. An earlier assets-in-lanes [TB, H, LANES]
# layout padded N=30 to 128 lanes (6.8x of every VPU op wasted) and
# lost everywhere — retired; measurements in RESULTS.md.


def _sum_assets(x):
    """Sum a [..., H, NP, TB] block over the asset (sublane) axis.

    Small NP: a plain cross-sublane VPU reduce. Large NP (>= 64): the
    VPU reduce is a ~NP/8-vreg sequential add chain on the solver's
    critical path while the MXU sits idle, so the reduction runs as an
    [8, NP] ones-matmul instead (row 0 of the [8, TB] product is the
    sum; the other 7 rows are free — the MXU is otherwise unused in the
    log-utility kernel). Leading axes beyond H are unrolled statically
    (scenario blocks). Measured on v5e (H=5, 1000 iters): N=500
    15.0k -> 18.9k solves/s (+26%; threshold sweeps alone +21%),
    N=120 +9%, N=64 +9%. The gate is measured, not guessed: at N=40
    the VPU wins by 12% and at N=30 by 8% (a 4-5-vreg add chain beats
    the MXU staging round-trip), so the crossover sits between NP=40
    and NP=64.
    """
    NP = x.shape[-2]
    if NP < 64:
        return jnp.sum(x, axis=-2, keepdims=True)
    ones = jnp.ones((8, NP), x.dtype)
    if x.ndim == 3:
        # precision=HIGHEST pins the Mosaic contraction to exact f32
        # (unpinned, the MXU default is a single bf16 pass: ~0.4%
        # per-element rounding in sums that feed the Michelot threshold
        # and the feas_tol=2e-4 convergence margin). Measured on v5e:
        # the pin costs nothing (N=500 18.7k vs 18.9k, within run noise).
        return jnp.stack([
            jnp.dot(ones, x[h], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)[:1]
            for h in range(x.shape[0])
        ])
    return jnp.stack([_sum_assets(x[s]) for s in range(x.shape[0])])


def _sum_assets_n(*xs):
    """Sum K same-shape [..., NP, TB] blocks over the asset axis at once.

    At NP >= 64 all K reductions ride ONE MXU ones-matmul
    ([8, NP] x [NP, K*TB] after a lane-axis stack) — identical FLOPs,
    K-1 fewer matmul issue/staging round-trips on the critical path
    (the reduce->threshold dependence chain is the N=500 kernel's
    binding resource, RESULTS.md roofline). Below the MXU gate the plain
    VPU reduces are kept (lane concatenation is not free there).
    Measured on v5e for K=2: N=500 headline 18.5k -> 19.6k solves/s
    (+6%, same-session A/B); the K=3 ball-membership fusion is
    _ball_l1_and_sweep.
    """
    NP = xs[0].shape[-2]
    if NP < 64 or len(xs) == 1:
        return tuple(jnp.sum(x, axis=-2, keepdims=True) for x in xs)
    TB = xs[0].shape[-1]
    stacked = jnp.concatenate(xs, axis=-1)           # [..., NP, K*TB]
    out = _sum_assets(stacked)                        # [..., 1, K*TB]
    return tuple(out[..., k * TB:(k + 1) * TB] for k in range(len(xs)))


def _sum_assets2(a, b):
    """Two-operand stacked asset reduce (see _sum_assets_n)."""
    return _sum_assets_n(a, b)


def _ball_l1_and_sweep(aqm, aq, radius, theta0):
    """One warm Michelot sweep for the l1-ball threshold FUSED with the
    unmasked l1 reduction (the ball-membership test).

    The dual prox needs BOTH l1(aq) (is the point inside the ball?) and
    a threshold sweep (count + masked sum) every iteration; at NP >= 64
    the three asset reductions ride one [8, NP] x [NP, 3TB] MXU
    contraction instead of two sequential matmul round-trips on the
    reduce->threshold critical path (round-3 VERDICT task #2; the
    padded-rows-are-zero invariant keeps l1 exact unmasked).
    ``aqm = aq + nm`` is the pre-masked sweep input. Returns (l1, theta
    after one warm sweep) — identical numerics to ``_sum_assets(aq)`` +
    ``_packed_threshold(aqm, radius, 1, theta0)``.
    """
    active = aqm > theta0
    cnt, s, l1 = _sum_assets_n(
        active.astype(aq.dtype), jnp.where(active, aqm, 0.0), aq
    )
    return l1, (s - radius) / jnp.maximum(cnt, 1.0)


def _packed_threshold(vm, radius, num_iters, theta0=None, n_valid=None):
    """Michelot/Newton simplex threshold over the ASSET axis (axis=-2).

    vm: [H, NP, TB] PRE-MASKED values (padded asset rows carry ~-inf so
    they can never enter the active set; valid rows are exact). Matches
    ops/projections.py:_simplex_threshold (values in the solver are O(1)
    so the max-centering there is unnecessary here). Callers compute
    ``vm = v + nm`` once and reuse it for the projection output, saving
    a full-width add per call. Returns theta [H, 1, TB].
    """
    if theta0 is None:
        v0 = jnp.where(vm > 0.5 * _NEG, vm, 0.0)
        theta = (_sum_assets(v0) - radius) / n_valid
    else:
        theta = theta0

    def body(_, theta):
        active = vm > theta
        count, s = _sum_assets2(
            active.astype(vm.dtype), jnp.where(active, vm, 0.0)
        )
        return (s - radius) / jnp.maximum(count, 1.0)

    # num_iters is a static Python int and small (warm sweeps: 2-4);
    # unroll fully to avoid Mosaic loop overhead inside the hot body.
    if num_iters <= 4:
        for i in range(num_iters):
            theta = body(i, theta)
        return theta
    return jax.lax.fori_loop(0, num_iters, body, theta)


def _sched_threshold(vm, radius, theta0, pred, extra, N):
    """Scheduled warm Michelot threshold, shared by the packed kernels'
    refresh bodies: one warm Newton sweep unconditionally, then a scalar
    ``lax.cond`` on ``pred`` (the refresh-iteration predicate) runs the
    remaining ``extra`` sweeps. See _make_packed_kernel.make_body_cond
    for the schedule's accuracy/VMEM rationale."""
    theta = _packed_threshold(vm, radius, 1, theta0=theta0, n_valid=float(N))
    if extra > 0:
        theta = jax.lax.cond(
            pred,
            lambda a: _packed_threshold(
                a[0], radius, extra, theta0=a[1], n_valid=float(N)
            ),
            lambda a: a[1],
            (vm, theta),
        )
    return theta


def _make_packed_kernel(params: MPCParams, H: int, N: int, NP: int,
                        cold_iters: int, S: Optional[int] = None,
                        warm_start: bool = False,
                        return_dual: bool = False):
    """Kernel factory. With ``S`` set, r carries a leading Monte-Carlo
    scenario axis and the smooth gradient is the scenario average
    (stochastic-Kelly program, see ops/scenario.py). With ``warm_start``,
    two extra input refs carry the previous primal/dual iterates; with
    ``return_dual``, a second output ref receives the final dual."""
    c = params.cost_coeff
    tau_to = params.max_turnover
    use_ball = tau_to > 0
    ridge = params.ridge
    rho = params.over_relax
    # proj_warm_iters=0 means "cold full-budget projections every
    # iteration" (ops/mpc.py:224, 239-240): drop the carried thresholds
    # and run the cold Michelot budget per projection.
    warm = params.proj_warm_iters >= 1
    warm_iters = params.proj_warm_iters if warm else cold_iters

    def kernel(cw_ref, r_ref, *rest):
        if warm_start:
            w_warm_ref, p_warm_ref = rest[0], rest[1]
            rest = rest[2:]
        out_ref = rest[0]
        fp_ref = rest[1]
        out_p_ref = rest[2] if return_dual else None
        r = r_ref[:]                         # [H, NP, TB] or [S, H, NP, TB]
        w_init = cw_ref[:]                                 # [NP, TB]
        TB = r.shape[-1]

        row = jax.lax.broadcasted_iota(jnp.int32, (NP, TB), 0)
        valid2 = (row < N).astype(r.dtype)                 # [NP, TB]
        nm = jnp.where(row < N, 0.0, _NEG).astype(r.dtype)[None]  # [1,NP,TB]

        # Per-problem Lipschitz bound (padded rows carry r = 0).
        r_norm2 = jnp.sum(r * r, axis=-2, keepdims=True)   # [(S,) H, 1, TB]
        r_big = jnp.where((nm if S is None else nm[None]) == 0.0, r, jnp.inf)
        r_min = jnp.min(r_big, axis=-2, keepdims=True)     # [(S,) H, 1, TB]
        ratio = r_norm2 / jnp.maximum(r_min, 1e-12) ** 2
        if S is None:
            L = jnp.max(ratio, axis=0, keepdims=True) + ridge      # [1,1,TB]
        else:
            # Mean over scenarios of the per-scenario (max over H) bound.
            L = jnp.mean(jnp.max(ratio, axis=1), axis=0,
                         keepdims=True) + ridge                    # [1,1,TB]
        if params.precond:
            # Per-horizon-row diagonal steps (ops/mpc.py::_pdhg_steps):
            # sigma_t = 2*s0/rowdeg_t, tau_t = 1/(L_t/2 + 2*s0*coldeg_t)
            # — identical math to the XLA solvers; the step constants
            # become [H, 1, TB] instead of [1, 1, TB], which costs
            # nothing in the full-width [H, NP, TB] body broadcasts.
            Lt = (ratio if S is None else jnp.mean(ratio, axis=0)) + ridge
            # Global scale from max_t of the per-row bound — the same
            # quantity _pdhg_steps uses (for S: max-of-mean, not the
            # uniform path's mean-of-max), so kernel<->XLA parity holds.
            s0 = params.sigma_scale * jnp.sqrt(
                jnp.max(Lt, axis=0, keepdims=True)
            ) / 2.0
            hrow = jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0)
            rowdeg = jnp.where(hrow == 0, 1.0, 2.0).astype(r.dtype)
            coldeg = jnp.where(hrow == H - 1, 1.0, 2.0).astype(r.dtype)
            sigma = 2.0 * s0 / rowdeg                              # [H,1,TB]
            tau_p = params.step_scale / (0.5 * Lt + 2.0 * s0 * coldeg)
        else:
            sigma = params.sigma_scale * jnp.sqrt(L) / 2.0
            tau_p = params.step_scale / (0.5 * L + sigma * 4.0)
        # q-scale dual-prox constant (see prox_phi_conj): the turnover
        # radius and the carried threshold live on sigma-times-a scale,
        # so the prox never materializes v = q/sigma or sigma*inner —
        # two fewer full-width multiplies per iteration. ([1,1,TB]
        # arithmetic here is ~free next to the full-width body ops.)
        sig_tau = sigma * tau_to
        # Ridge decay folded into a loop constant: w - tau_p*ridge*w is
        # c1*w (one [1,1,TB]-broadcast multiply instead of multiply+add).
        c1 = 1.0 - tau_p * ridge

        def proj_simplex(v, theta0, n_sweeps):
            vm = v + nm
            theta = _packed_threshold(
                vm, 1.0, n_sweeps, theta0=theta0, n_valid=float(N)
            )
            return jnp.maximum(vm - theta, 0.0), theta

        def apply_D(w):
            if H == 1:   # Mosaic rejects the 0-size w[:-1] slice
                return w - w_init[None]
            prev = jnp.concatenate([w_init[None], w[:-1]], axis=0)
            return w - prev

        def apply_Dt(p):
            if H == 1:
                return p
            nxt = jnp.concatenate([p[1:], jnp.zeros_like(p[:1])], axis=0)
            return p - nxt

        def apply_D0(x):
            # Difference operator on a DELTA (no w_init offset row).
            if H == 1:
                return x
            prev = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
            return x - prev

        def prox_phi_conj(q, theta0, n_sweeps):
            # Invariant: padded asset rows of q are exactly 0 (w, p, and
            # their differences stay 0 there), so aq is 0 on padded rows
            # and the l1 reduction needs no mask.
            #
            # Everything runs on q-SCALE (sigma times the a-scale of the
            # XLA solver): aq = sigma*|soft(q/sigma)| = max(|q| - c, 0),
            # the ball radius becomes sig_tau = sigma*tau_to, the carried
            # threshold is sigma*theta_a. CLIP FORM (round 3): for any
            # bound b >= 0, q - sign(q)*max(|q| - b, 0) == clip(q, -b, b),
            # so the prox output is a single clip against the
            # REDUCED-WIDTH [H, 1, TB] bound c (inside the ball) or
            # c + max(theta, 0) (outside) — the full-width sign/mul/
            # select chain of the soft-threshold form (~5 vector ops)
            # drops out. aq is still materialized once as the l1/
            # threshold input. Measured on v5e (same-session A/B,
            # headline H=5/N=30 B=8192 @1000 iters, median of 5):
            # 168.7k -> 193.0k solves/s, +14%; N=500 +9%.
            aq = jnp.maximum(jnp.abs(q) - c, 0.0)
            theta = theta0
            if use_ball:
                aqm = aq + nm
                if theta0 is not None:
                    # Warm path: fuse l1 into the first sweep's MXU
                    # contraction (_ball_l1_and_sweep), then run the
                    # remaining warm budget.
                    l1, theta = _ball_l1_and_sweep(aqm, aq, sig_tau,
                                                   theta0)
                    if n_sweeps > 1:
                        theta = _packed_threshold(
                            aqm, sig_tau, n_sweeps - 1, theta0=theta,
                            n_valid=float(N),
                        )
                else:
                    l1 = _sum_assets(aq)
                    theta = _packed_threshold(
                        aqm, sig_tau, n_sweeps, theta0=None,
                        n_valid=float(N),
                    )
                bound = c + jnp.where(
                    l1 <= sig_tau, 0.0, jnp.maximum(theta, 0.0)
                )                                            # [H, 1, TB]
                return jnp.clip(q, -bound, bound), theta
            return jnp.clip(q, -c, c), theta

        if warm_start:
            w0 = w_warm_ref[:]
            p0 = p_warm_ref[:]
            # Thresholds re-derived cold on the first in-loop projection;
            # a cold Michelot start is globally convergent (see
            # ops/projections.py) so only the first sweep set pays extra.
            th_w0 = _packed_threshold(w0 + nm, 1.0, cold_iters,
                                      n_valid=float(N))
        else:
            w0, th_w0 = proj_simplex(
                jnp.broadcast_to(w_init[None], (H, NP, TB)), None, cold_iters
            )
            p0 = jnp.zeros_like(w0)
        th_p0 = jnp.zeros_like(th_w0)

        def smooth_grad(w):
            if S is None:
                port = _sum_assets(w * r)                       # [H, 1, TB]
                # Divide on the [H, 1, TB] reduction, multiply full-width.
                return r * (-1.0 / jnp.maximum(port, 1e-12))
            port = _sum_assets(w[None] * r)                       # [S,H,1,TB]
            g = r * (-1.0 / jnp.maximum(port, 1e-12))
            return jnp.mean(g, axis=0)                            # [H,NP,TB]

        def primal_pre(w, p):
            # w - tau_p*(grad g(w) + ridge*w + D'p) with tau_p folded
            # into the portfolio reciprocal (the grad g multiply doubles
            # as the step multiply) and the ridge decay folded into the
            # loop constant c1 — one full-width multiply and one add
            # fewer per iteration than materializing grad. Fixed-step
            # bodies only; the adaptive body carries its own tau.
            if S is None:
                port = _sum_assets(w * r)
                g = r * (tau_p / jnp.maximum(port, 1e-12))
            else:
                port = _sum_assets(w[None] * r)
                g = jnp.mean(
                    r * (tau_p / jnp.maximum(port, 1e-12)), axis=0
                )
            base = w if ridge == 0.0 else c1 * w
            return base + (g - tau_p * apply_Dt(p))

        def make_body(n_sweeps):
            def body(_, carry):
                w, p, th_w, th_p = carry
                w_new, th_w = proj_simplex(
                    primal_pre(w, p), th_w if warm else None, n_sweeps,
                )
                w_bar = 2.0 * w_new - w
                p_new, th_p_new = prox_phi_conj(
                    p + sigma * apply_D(w_bar),
                    th_p if warm else None, n_sweeps,
                )
                # Keep the carry structure stable: without the turnover
                # ball (and in cold mode) prox returns theta0 untouched.
                th_p = th_p if th_p_new is None else th_p_new
                if rho != 1.0:   # over-relaxation (ops/mpc.py:260-262)
                    w_new = w + rho * (w_new - w)
                    p_new = p + rho * (p_new - p)
                return (w_new, p_new, th_w, th_p)

            return body

        body = make_body(warm_iters)
        carry0 = (w0, p0, th_w0, th_p0)
        refresh = params.proj_refresh_every

        def make_body_cond(refresh):
            # Sweep schedule: one warm Newton sweep unconditionally, then
            # a scalar `lax.cond` on the iteration index runs the
            # remaining (warm_iters - 1) sweeps every refresh-th
            # iteration. The single warm sweep trails a moving active set
            # by one step; the periodic full refresh re-converges the
            # threshold, bounding drift (measured: ~5e-5 weight tail,
            # objective unchanged at 1000 iters). A two-loop-body blocked
            # variant measured SLOWER (176k vs 182k headline) and
            # overflowed Mosaic's scoped-VMEM stack at N=500 working
            # sets; the cond region compiles small and fits everywhere.
            extra = warm_iters - 1

            def body(i, carry):
                w, p, th_w, th_p = carry
                pred = (i % refresh) == 0
                vm = primal_pre(w, p) + nm
                th_w = _sched_threshold(vm, 1.0, th_w, pred, extra, N)
                w_new = jnp.maximum(vm - th_w, 0.0)
                w_bar = 2.0 * w_new - w
                # Dual prox on q-scale in CLIP FORM (see prox_phi_conj):
                # no v = q/sigma or sigma*inner full-width multiplies,
                # and the sign/mul/select soft-threshold chain collapses
                # to one clip against a reduced-width bound.
                q = p + sigma * apply_D(w_bar)
                aq = jnp.maximum(jnp.abs(q) - c, 0.0)
                if use_ball:
                    # l1 fused into the warm sweep's MXU contraction
                    # (one staging round-trip instead of two on the
                    # reduce->threshold chain; _ball_l1_and_sweep).
                    aqm = aq + nm
                    l1, th_p = _ball_l1_and_sweep(aqm, aq, sig_tau, th_p)
                    if extra > 0:
                        th_p = jax.lax.cond(
                            pred,
                            lambda a: _packed_threshold(
                                a[0], sig_tau, extra, theta0=a[1],
                                n_valid=float(N),
                            ),
                            lambda a: a[1],
                            (aqm, th_p),
                        )
                    bound = c + jnp.where(
                        l1 <= sig_tau, 0.0, jnp.maximum(th_p, 0.0)
                    )
                    p_new = jnp.clip(q, -bound, bound)
                else:
                    p_new = jnp.clip(q, -c, c)
                if rho != 1.0:   # over-relaxation (ops/mpc.py:260-262)
                    w_new = w + rho * (w_new - w)
                    p_new = p + rho * (p_new - p)
                return (w_new, p_new, th_w, th_p)

            return body

        def make_trip_pipe(k):
            # PIPELINED REDUCES (round 5): break the reduce -> threshold
            # dependence chain — the N=500 kernel's measured critical
            # path (an MXU staging round-trip gates the projection,
            # RESULTS.md roofline). Design constraints learned by
            # measurement: Mosaic neither software-pipelines across
            # fori_loop carry boundaries nor schedules across lax.cond
            # boundaries, so a cond-based stale-threshold body measured
            # SLOWER (11.8k vs 13.8k). This version is COND-FREE and
            # STATICALLY UNROLLED: each loop trip runs k-1 pipelined
            # iterations (project with the CARRIED one-iteration-stale
            # thresholds and ball l1, then issue this iteration's sweep
            # whose result feeds the NEXT in-block iteration — the MXU
            # round-trip overlaps the iteration's own elementwise tail)
            # followed by ONE synchronous full-budget iteration that
            # re-converges the thresholds from the current values,
            # bounding the trailing drift like proj_refresh_every does.
            def pipe_iter(cy):
                # The PRIMAL Michelot sweep stays SYNCHRONOUS: a
                # one-iteration-stale simplex threshold has feedback
                # gain proportional to the active count (sum w_new
                # moves by cnt * theta_error per iteration), which is
                # stable at N=30 but measured DIVERGENT at N=500
                # (fp residual ~1e8). The dual ball threshold, the
                # ball-membership l1, and the portfolio sums are the
                # pipelined ones — the dual is intrinsically stable
                # (p is clipped to [-bound, bound] every iteration) and
                # the port carry is EXACT (just hoisted).
                w, p, th_w, th_p, l1s = cy
                vm = primal_pre(w, p) + nm
                th_w = _packed_threshold(vm, 1.0, 1, theta0=th_w,
                                         n_valid=float(N))
                w_new = jnp.maximum(vm - th_w, 0.0)
                w_bar = 2.0 * w_new - w
                q = p + sigma * apply_D(w_bar)
                aq = jnp.maximum(jnp.abs(q) - c, 0.0)
                if use_ball:
                    aqm = aq + nm
                    bound = c + jnp.where(
                        l1s <= sig_tau, 0.0, jnp.maximum(th_p, 0.0)
                    )
                    p_new = jnp.clip(q, -bound, bound)
                else:
                    p_new = jnp.clip(q, -c, c)
                if rho != 1.0:
                    w_new = w + rho * (w_new - w)
                    p_new = p + rho * (p_new - p)
                # End-of-body stacked reduce, consumed NEXT iteration:
                # ball count/sum + l1 + portfolio sums in one MXU
                # staging round-trip off the critical path.
                if use_ball:
                    ball_act = aqm > th_p
                    cnt_p, s_p, l1_n = _sum_assets_n(
                        ball_act.astype(vm.dtype),
                        jnp.where(ball_act, aqm, 0.0), aq,
                    )
                    th_p_n = (s_p - sig_tau) / jnp.maximum(cnt_p, 1.0)
                else:
                    l1_n, th_p_n = l1s, th_p
                return (w_new, p_new, th_w, th_p_n, l1_n)

            def sync_iter(cy):
                w, p, th_w, th_p, l1s = cy
                vm = primal_pre(w, p) + nm
                th_w = _packed_threshold(vm, 1.0, warm_iters,
                                         theta0=th_w, n_valid=float(N))
                w_new = jnp.maximum(vm - th_w, 0.0)
                w_bar = 2.0 * w_new - w
                q = p + sigma * apply_D(w_bar)
                aq = jnp.maximum(jnp.abs(q) - c, 0.0)
                if use_ball:
                    aqm = aq + nm
                    l1s, th_p = _ball_l1_and_sweep(aqm, aq, sig_tau,
                                                   th_p)
                    if warm_iters > 1:
                        th_p = _packed_threshold(
                            aqm, sig_tau, warm_iters - 1, theta0=th_p,
                            n_valid=float(N),
                        )
                    bound = c + jnp.where(
                        l1s <= sig_tau, 0.0, jnp.maximum(th_p, 0.0)
                    )
                    p_new = jnp.clip(q, -bound, bound)
                else:
                    p_new = jnp.clip(q, -c, c)
                if rho != 1.0:
                    w_new = w + rho * (w_new - w)
                    p_new = p + rho * (p_new - p)
                return (w_new, p_new, th_w, th_p, l1s)

            def trip(_t, cy):
                for _j in range(k - 1):
                    cy = pipe_iter(cy)
                return sync_iter(cy)

            return trip, sync_iter

        def body_adaptive(i, carry, do_bal=None):
            # Residual-balancing adaptive steps (ops/mpc.py body's
            # params.adaptive branch, same constants): tau/sigma become
            # loop-carried [1, 1, TB] values, the dual reciprocal is
            # recomputed per iteration (a [1,1,TB] divide), and two extra
            # full-width reductions compute the primal/dual residuals.
            # Full warm projection budget every iteration: composing the
            # proj_refresh_every sweep schedule with adaptive steps is a
            # MEASURED DEAD END (round 3): single-sweep trailing
            # thresholds break the prox accuracy the residual balancing
            # depends on — objective gap 1.2e-2 at refresh 4/8/16 vs
            # 7.8e-5 with the full budget, whether the balancing runs
            # every iteration or only on exact refresh iterations. The
            # schedule is therefore ignored under adaptive (the XLA
            # solver behaves identically).
            w, p, th_w, th_p, tau_c, sig_c, alpha_c = carry
            grad = smooth_grad(w)
            if ridge != 0.0:
                grad = grad + ridge * w
            w_new, th_w = proj_simplex(
                w - tau_c * (grad + apply_Dt(p)),
                th_w if warm else None, warm_iters,
            )
            w_bar = 2.0 * w_new - w
            q = p + sig_c * apply_D(w_bar)
            inv_s = 1.0 / sig_c
            v = q * inv_s
            a = jnp.maximum(jnp.abs(v) - c * inv_s, 0.0)
            # Clip form (see prox_phi_conj): sign(v)*max(|v| - b, 0) ==
            # v - clip(v, -b, b) for any bound b >= 0, with the bound a
            # reduced-width [H, 1, TB] value — drops the full-width
            # sign/mul/select chain. (inner stays explicit so the
            # inside-the-bound case keeps p_new = q exactly.)
            if use_ball:
                am = a + nm
                if warm:
                    # l1 fused into the first warm sweep (see
                    # _ball_l1_and_sweep), a-scale here.
                    l1, th_p = _ball_l1_and_sweep(am, a, tau_to, th_p)
                    if warm_iters > 1:
                        th_p = _packed_threshold(
                            am, tau_to, warm_iters - 1, theta0=th_p,
                            n_valid=float(N),
                        )
                else:
                    l1 = _sum_assets(a)
                    th_p = _packed_threshold(
                        am, tau_to, warm_iters, theta0=None,
                        n_valid=float(N),
                    )
                bound = c * inv_s + jnp.where(
                    l1 <= tau_to, 0.0, jnp.maximum(th_p, 0.0)
                )
            else:
                bound = c * inv_s
            inner = v - jnp.clip(v, -bound, bound)
            p_new = q - sig_c * inner

            def _bal(a):
                # The two full-width residual reductions are most of the
                # adaptive body's ~24%/iteration tax; with
                # ``params.adapt_every > 1`` the BLOCK-UNROLLED loop
                # below runs them only in the last sub-step of each
                # k-block. (A per-iteration scalar lax.cond was measured
                # to eat roughly half the savings: passing the
                # full-width dw/dp operands through the cond boundary
                # costs what the skipped reductions save — k=2 was
                # NEUTRAL, k=8 only +6.5% on the chip.)
                dw, dp, tau_c, sig_c, alpha_c = a
                pr = jnp.sqrt(jnp.sum(
                    (dw / tau_c - apply_Dt(dp)) ** 2, axis=(0, 1)
                ))[None, None]                               # [1, 1, TB]
                dr = jnp.sqrt(jnp.sum(
                    (dp / sig_c - apply_D0(dw)) ** 2, axis=(0, 1)
                ))[None, None]
                return _balance_steps(pr, dr, tau_c, sig_c, alpha_c)

            bal_args = (w - w_new, p - p_new, tau_c, sig_c, alpha_c)
            if do_bal is None:
                # fori body — only the adapt_every <= 1 path reaches it
                # (adapt_every > 1 always compiles the block-unrolled
                # schedule below), so balance unconditionally. A
                # per-iteration lax.cond here is a measured dead end:
                # passing the full-width dw/dp operands through the cond
                # boundary costs what the skipped reductions save.
                tau_c, sig_c, alpha_c = _bal(bal_args)
            elif do_bal:                # block-unrolled: static choice
                tau_c, sig_c, alpha_c = _bal(bal_args)
            if rho != 1.0:
                w_new = w + rho * (w_new - w)
                p_new = p + rho * (p_new - p)
            return (w_new, p_new, th_w, th_p, tau_c, sig_c, alpha_c)

        # Unrolling this loop 2x measured SLOWER (152k vs 156k on the
        # headline): Mosaic's per-iteration loop overhead is negligible
        # next to the ~50 vector ops in the body, and the larger body
        # hurts scheduling — same conclusion as the XLA-scan unroll.
        tau_f = tau_p
        if params.adaptive:
            ones = jnp.ones_like(L)
            carry_a = carry0 + (tau_p * ones, sigma * ones, 0.5 * ones)
            k_bal = params.adapt_every
            if k_bal > 1:
                # Block-unrolled sparse balancing: k-1 plain sub-steps +
                # one balancing sub-step per loop trip (identical
                # schedule to the XLA solver's i % k == k-1 cond, no
                # per-iteration cond overhead — see _bal's comment).
                n_trips, rem = divmod(params.max_iters, k_bal)

                def block(_, c_):
                    for _j in range(k_bal - 1):
                        c_ = body_adaptive(0, c_, do_bal=False)
                    return body_adaptive(0, c_, do_bal=True)

                carry_a = jax.lax.fori_loop(0, n_trips, block, carry_a)
                for _j in range(rem):
                    carry_a = body_adaptive(0, carry_a, do_bal=False)
                w, p, _, _, tau_f, _, _ = carry_a
            else:
                w, p, _, _, tau_f, _, _ = jax.lax.fori_loop(
                    0, params.max_iters, body_adaptive, carry_a,
                )
        elif warm and refresh > 1 and params.pipeline_reduces:
            carry_p = carry0 + (jnp.zeros_like(th_w0),)
            # Cap the static unroll at 8 sub-iterations/trip: larger
            # blocks risk the scoped-VMEM overflow the round-2 blocked
            # refresh variant hit at N=500 working sets.
            k_pipe = min(refresh, 8)
            trip, sync_one = make_trip_pipe(k_pipe)
            n_trips, rem = divmod(params.max_iters, k_pipe)
            carry_p = jax.lax.fori_loop(0, n_trips, trip, carry_p)
            for _j in range(rem):
                carry_p = sync_one(carry_p)
            w, p, _, _, _ = carry_p
        elif warm and refresh > 1:
            w, p, _, _ = jax.lax.fori_loop(
                0, params.max_iters, make_body_cond(refresh), carry0
            )
        else:
            w, p, _, _ = jax.lax.fori_loop(
                0, params.max_iters, body, carry0
            )
        # One extra primal half-step, exactly as the XLA solver's tail
        # (ops/mpc.py:270-274): the returned iterate is w_last and the
        # fixed-point residual max|w_last - w| is the convergence
        # diagnostic. Cold-budget projection so the residual is not
        # polluted by warm-threshold drift.
        grad = smooth_grad(w)
        if ridge != 0.0:
            grad = grad + ridge * w
        w_last, _ = proj_simplex(
            w - tau_f * (grad + apply_Dt(p)), None, cold_iters
        )
        w_last = w_last * valid2[None]
        out_ref[:] = w_last
        fp_ref[:] = jnp.max(jnp.abs(w_last - w * valid2[None]),
                            axis=(0, 1))[None]
        if return_dual:
            out_p_ref[:] = p * valid2[None]

    return kernel


def _finalize_packed(w, r, w_init, params: MPCParams, fp_res):
    """Shared wrapper tail: feasibility restoration, solver-failure
    hold-weights fallback, and info dict — semantics identical to the
    XLA solver's tail (ops/mpc.py:266-309; reference failure behavior:
    mpc.py:113-116). ``w`` is the kernel's extra-half-step iterate
    (w_last) and ``fp_res`` its in-kernel fixed-point residual, so the
    diagnostics are the same quantities the XLA solver reports. ``r``
    may carry a scenario axis [B, S, H, N]."""
    scen = r.ndim == 4
    tau_to = params.max_turnover
    use_ball = tau_to > 0

    u_pre = w - jnp.concatenate([w_init[:, None, :], w[:, :-1, :]], axis=1)
    if use_ball:
        to_viol = jnp.max(
            jnp.maximum(jnp.sum(jnp.abs(u_pre), axis=-1) - tau_to, 0.0),
            axis=-1,
        )
        if params.restore_feasibility:
            w = restore_turnover_feasibility(w, w_init, tau_to)
    else:
        to_viol = jnp.zeros(w.shape[:-2], w.dtype)

    finite = jnp.isfinite(fp_res)
    if use_ball and params.restore_feasibility:
        converged = finite
    else:
        converged = finite & (to_viol <= params.feas_tol)

    # Solver-failure fallback: hold current weights (reference:
    # mpc.py:113-116) instead of letting NaN iterates poison a backtest.
    hold = jnp.broadcast_to(w_init[:, None, :], w.shape)
    w = jnp.where(finite[:, None, None], w, hold)

    if scen:
        port = jnp.sum(w[..., None, :, :] * r, axis=-1)    # [B, S, H]
        growth = jnp.mean(
            jnp.sum(jnp.log(jnp.maximum(port, 1e-30)), axis=-1), axis=-1
        )
        u = w - jnp.concatenate([w_init[:, None, :], w[:, :-1, :]], axis=1)
        objective = growth - params.cost_coeff * jnp.sum(
            jnp.abs(u), axis=(-2, -1)
        )
    else:
        objective = _log_utility_objective(w, r, w_init, params.cost_coeff)

    info = {
        "objective": objective,
        "converged": converged,
        "turnover_violation": to_viol,
        "fixed_point_residual": fp_res,
        "status_code": _status_code(fp_res, params.feas_tol),
    }
    return w, info


def _default_tile_b_packed(H: int, NP: int, S: Optional[int] = None,
                           extra_blocks: int = 0):
    """One 128-lane tile when it fits. Measured FASTEST at every workload
    tried (H=5/NP=32: 142k vs 130k at tb=256; H=20: 39.0k vs 36.2k;
    N=500: 11.6k, tb=256 overflows VMEM with an opaque remote-compile
    failure) — smaller tiles keep the working set near the vector
    registers and Mosaic's scheduling tight. The lane axis cannot tile
    below 128, so when even tb=128 overflows the ~16 MB/core VMEM
    (e.g. S=16 x N=500, or H=20 x N=500) this returns None and the
    wrappers fall back to the XLA-scan solver instead of crashing the
    compile. ``extra_blocks`` counts additional [H, NP, tb] VMEM blocks
    the caller declares beyond the base (warm-start inputs, dual
    output)."""
    tb = 128
    # Working set: the r block (S copies) + ~7 live f32 iterate/temp
    # arrays of [H, NP, tb] + caller-declared extras. 12 MB leaves
    # headroom for Mosaic temporaries (N=500/H=5 at 10.3 MB measured
    # fine; tb=256's 20.6 MB failed).
    budget = 12 * 1024 * 1024
    # +1: the extra-half-step iterate (w_last) live at the kernel tail.
    # Callers must declare the adaptive body's extra live temporaries
    # (dw/dp + the two residual expressions) through ``extra_blocks`` —
    # see _adaptive_extra_blocks.
    need = ((S or 1) + 8 + extra_blocks) * H * NP * tb * 4
    return tb if need <= budget else None


def _adaptive_extra_blocks(params: MPCParams) -> int:
    """Extra live [H, NP, tb] VMEM blocks of the adaptive body.

    body_adaptive keeps dw, dp, and the two residual expressions live
    past the prox (the fixed-step bodies free their temporaries before
    the dual update), so an adaptive solve that passes the base budget
    can still overflow VMEM at compile time. Declaring +3 blocks makes
    borderline working sets (e.g. adaptive at N=500/H=5) take the
    graceful XLA fallback instead of an opaque remote-compile failure.
    """
    return 3 if params.adaptive else 0


def _match_packed_info(info, return_dual: bool = False,
                       num_scenarios: Optional[int] = None):
    """Restrict an XLA solver's info dict to the packed wrappers' keys.

    The fallback paths must return the SAME info pytree structure as the
    kernel paths — `jax.shard_map` callers (parallel/mesh.py) declare
    out_specs for the packed keys, and a parameter-dependent extra key
    (an unconditional 'dual') would make the fallback a
    structure-breaking change rather than a drop-in."""
    out = {
        "objective": info["objective"],
        "converged": info["converged"],
        "turnover_violation": info["turnover_violation"],
        "fixed_point_residual": info["fixed_point_residual"],
        "status_code": info["status_code"],
    }
    if return_dual:
        out["dual"] = info["dual"]
    if num_scenarios is not None:
        out["num_scenarios"] = num_scenarios
    return out


def solve_mpc_log_utility_pallas_packed(
    current_weights: jax.Array,
    predicted_log_returns: jax.Array,
    params: MPCParams,
    tile_b: Optional[int] = None,
    interpret: bool = False,
    w_warm: Optional[jax.Array] = None,
    p_warm: Optional[jax.Array] = None,
    return_dual: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Batch-in-lanes fused solve: [B, N] x [B, H, N] -> ([B, H, N], info).

    Assets are padded to a multiple of 8 sublanes, the batch to a multiple
    of the 128-lane tile; results come back unpadded. Numerics match
    solve_mpc_log_utility_batch (same iteration, projections, and warm
    thresholds), including its optional ``w_warm``/``p_warm`` iterate
    warm starts; ``return_dual`` adds ``info['dual']`` for carrying the
    warm state across repeated solves (e.g. Jacobi backtest sweeps).
    """
    reject_unhonored_polish(params, "solve_mpc_log_utility_pallas_packed")
    B, H, N = predicted_log_returns.shape
    NP = ((N + 7) // 8) * 8
    dtype = jnp.float32
    warm_start = w_warm is not None
    if tile_b is None:
        tile_b = _default_tile_b_packed(
            H, NP,
            extra_blocks=(2 if warm_start else 0)
            + (1 if return_dual else 0)
            + _adaptive_extra_blocks(params),
        )
    if _needs_xla_fallback(params) or tile_b is None:
        # Unsupported parameter surface or a working set that cannot fit
        # VMEM at the minimum 128-lane tile: solve with the XLA scan
        # (identical program, full parameter support) instead of silently
        # solving a different program / failing the compile.
        w, info = solve_mpc_log_utility_batch(
            current_weights, predicted_log_returns, params,
            w_warm=w_warm, p_warm=p_warm,
        )
        return w, _match_packed_info(info, return_dual=return_dual)
    # CPU has no Mosaic backend; fall back to interpret mode so callers
    # (tests, --cpu CLIs) can flip the fused path on without branching.
    interpret = interpret or jax.default_backend() == "cpu"

    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    r = jnp.exp(predicted_log_returns).astype(dtype)
    # [B, H, N] -> [H, N, B]: batch rides the lane axis, assets sublanes.
    r_t = jnp.transpose(r, (1, 2, 0))
    r_pad = jnp.pad(r_t, ((0, 0), (0, NP - N), (0, Bp - B)))
    cw_t = jnp.transpose(current_weights.astype(dtype), (1, 0))
    cw_pad = jnp.pad(cw_t, ((0, NP - N), (0, Bp - B)))

    cold_iters = 8 if N <= 64 else (12 if N <= 256 else 16)
    kernel = _make_packed_kernel(params, H, N, NP, cold_iters,
                                 warm_start=warm_start,
                                 return_dual=return_dual)
    grid = (Bp // tile_b,)

    block3 = pl.BlockSpec((H, NP, tile_b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((NP, tile_b), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        block3,
    ]
    operands = [cw_pad, r_pad]
    if warm_start:
        def pack3(x):
            return jnp.pad(
                jnp.transpose(x.astype(dtype), (1, 2, 0)),
                ((0, 0), (0, NP - N), (0, Bp - B)),
            )
        operands += [pack3(w_warm),
                     pack3(p_warm if p_warm is not None
                           else jnp.zeros_like(w_warm))]
        in_specs += [block3, block3]

    fp_spec = pl.BlockSpec((1, tile_b), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    fp_shape = jax.ShapeDtypeStruct((1, Bp), dtype)
    out_shape = [jax.ShapeDtypeStruct((H, NP, Bp), dtype), fp_shape]
    out_specs = [block3, fp_spec]
    if return_dual:
        out_shape.append(jax.ShapeDtypeStruct((H, NP, Bp), dtype))
        out_specs.append(block3)

    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*operands)
    w_pad, fp_pad = out[0], out[1]
    p_pad = out[2] if return_dual else None

    w = jnp.transpose(w_pad[:, :N, :B], (2, 0, 1))         # [B, H, N]
    w_init = current_weights.astype(dtype)
    w, info = _finalize_packed(w, r, w_init, params, fp_pad[0, :B])
    if return_dual:
        info["dual"] = jnp.transpose(p_pad[:, :N, :B], (2, 0, 1))
    return w, info


def solve_mpc_log_utility_scenarios_packed(
    current_weights: jax.Array,
    scenario_log_returns: jax.Array,
    params: MPCParams,
    tile_b: Optional[int] = None,
    interpret: bool = False,
    w_warm: Optional[jax.Array] = None,
    p_warm: Optional[jax.Array] = None,
    return_dual: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Batch-in-lanes fused scenario-averaged Kelly solve.

    [B, N] x [B, S, H, N] -> ([B, H, N], info); numerics match
    ops/scenario.py::solve_mpc_log_utility_scenarios (same iteration;
    the smooth gradient is the scenario average), including its
    ``w_warm``/``p_warm`` iterate warm starts; ``return_dual`` adds
    ``info['dual']`` for carrying warm state across repeated solves
    (e.g. Jacobi backtest sweeps).
    """
    reject_unhonored_polish(params, "solve_mpc_log_utility_scenarios_packed")
    B, S, H, N = scenario_log_returns.shape
    NP = ((N + 7) // 8) * 8
    dtype = jnp.float32
    warm_start = w_warm is not None
    if tile_b is None:
        tile_b = _default_tile_b_packed(
            H, NP, S=S,
            extra_blocks=(2 if warm_start else 0)
            + (1 if return_dual else 0)
            + _adaptive_extra_blocks(params),
        )
    if _needs_xla_fallback(params) or tile_b is None:
        from kmpc_tpu.ops.scenario import solve_mpc_log_utility_scenarios

        w, info = solve_mpc_log_utility_scenarios(
            current_weights, scenario_log_returns, params,
            w_warm=w_warm, p_warm=p_warm,
        )
        return w, _match_packed_info(info, num_scenarios=S,
                                     return_dual=return_dual)
    interpret = interpret or jax.default_backend() == "cpu"

    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    r = jnp.exp(scenario_log_returns).astype(dtype)        # [B, S, H, N]
    r_t = jnp.transpose(r, (1, 2, 3, 0))                   # [S, H, N, B]
    r_pad = jnp.pad(r_t, ((0, 0), (0, 0), (0, NP - N), (0, Bp - B)))
    cw_t = jnp.transpose(current_weights.astype(dtype), (1, 0))
    cw_pad = jnp.pad(cw_t, ((0, NP - N), (0, Bp - B)))

    cold_iters = 8 if N <= 64 else (12 if N <= 256 else 16)
    kernel = _make_packed_kernel(params, H, N, NP, cold_iters, S=S,
                                 warm_start=warm_start,
                                 return_dual=return_dual)
    grid = (Bp // tile_b,)

    block3 = pl.BlockSpec((H, NP, tile_b), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    fp_spec = pl.BlockSpec((1, tile_b), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((NP, tile_b), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, H, NP, tile_b), lambda i: (0, 0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [cw_pad, r_pad]
    if warm_start:
        def pack3(x):
            return jnp.pad(
                jnp.transpose(x.astype(dtype), (1, 2, 0)),
                ((0, 0), (0, NP - N), (0, Bp - B)),
            )
        operands += [pack3(w_warm),
                     pack3(p_warm if p_warm is not None
                           else jnp.zeros_like(w_warm))]
        in_specs += [block3, block3]

    out_shape = [jax.ShapeDtypeStruct((H, NP, Bp), dtype),
                 jax.ShapeDtypeStruct((1, Bp), dtype)]
    out_specs = [block3, fp_spec]
    if return_dual:
        out_shape.append(jax.ShapeDtypeStruct((H, NP, Bp), dtype))
        out_specs.append(block3)

    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*operands)
    w_pad, fp_pad = out[0], out[1]
    p_pad = out[2] if return_dual else None

    w = jnp.transpose(w_pad[:, :N, :B], (2, 0, 1))         # [B, H, N]
    w_init = current_weights.astype(dtype)
    w, info = _finalize_packed(w, r, w_init, params, fp_pad[0, :B])
    info["num_scenarios"] = S
    if return_dual:
        info["dual"] = jnp.transpose(p_pad[:, :N, :B], (2, 0, 1))
    return w, info

# ---------------------------------------------------------------------------
# Mean-variance packed kernel (Markowitz baseline's program)
# ---------------------------------------------------------------------------


def _make_packed_mv_kernel(params: MPCParams, H: int, N: int, NP: int,
                           cold_iters: int, shared_sigma: bool = False,
                           unroll: int = 1):
    """Mean-variance PDHG kernel, batch-in-lanes layout.

        min_w  sum_t [gamma w_t' Sigma w_t - w_t.mu_t] + c sum_t ||u_t||_1
        s.t.   w_t in simplex

    Same iteration as ops/mpc.py::solve_mpc_mean_variance_batch (the
    reference MV program has no turnover ball, reference: mpc.py:144-171,
    so the dual prox is a plain clip). Per-problem Sigma rides VMEM as
    [NPm, NPn, TB]; the quadratic gradient Sigma @ w_t is a
    sublane-broadcast multiply + n-axis reduction per horizon step.
    With ``shared_sigma`` the covariance is one [NPm, NPn] block shared
    by every problem (no [B, N, N] HBM expansion) and the quadratic
    gradient is a plain 2-D matmul on the MXU.
    """
    c = params.cost_coeff
    gamma = params.gamma
    rho = params.over_relax
    warm = params.proj_warm_iters >= 1
    warm_iters = params.proj_warm_iters if warm else cold_iters
    refresh = params.proj_refresh_every

    def kernel(cw_ref, mu_ref, sig_ref, out_ref):
        mu = mu_ref[:]                                     # [H, NP, TB]
        w_init = cw_ref[:]                                 # [NP, TB]
        Sigma = sig_ref[:]                     # [NPm, NPn(, TB)]
        TB = mu.shape[-1]

        row = jax.lax.broadcasted_iota(jnp.int32, (NP, TB), 0)
        valid2 = (row < N).astype(mu.dtype)
        nm = jnp.where(row < N, 0.0, _NEG).astype(mu.dtype)[None]

        # L_g = 2 gamma ||Sigma||_2 <= 2 gamma ||Sigma||_F (padded
        # rows/cols carry zeros). Same bound as the XLA solver.
        if shared_sigma:
            fro = jnp.sqrt(jnp.sum(Sigma * Sigma))         # scalar
        else:
            fro = jnp.sqrt(jnp.sum(Sigma * Sigma, axis=(0, 1)))[None, None]
        L = jnp.maximum(2.0 * gamma * fro, 1e-6)     # [1, 1, TB] or scalar
        sigma = params.sigma_scale * jnp.sqrt(L + 1.0) / 2.0
        tau_p = params.step_scale / (0.5 * L + sigma * 4.0)

        def apply_D(w):
            if H == 1:   # Mosaic rejects the 0-size w[:-1] slice
                return w - w_init[None]
            prev = jnp.concatenate([w_init[None], w[:-1]], axis=0)
            return w - prev

        def apply_Dt(p):
            if H == 1:
                return p
            nxt = jnp.concatenate([p[1:], jnp.zeros_like(p[:1])], axis=0)
            return p - nxt

        def grad_g(w):
            # (Sigma @ w_t)[m, b]; static unroll over the horizon (H is
            # small). Shared Sigma: one clean [NP,NP]x[NP,TB] MXU matmul
            # per step; per-problem Sigma: sublane-broadcast multiply +
            # n-axis reduction.
            if shared_sigma:
                quad = jnp.stack([
                    jnp.dot(Sigma, w[h],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    for h in range(H)
                ])
            else:
                quad = jnp.stack([
                    jnp.sum(Sigma * w[h][None], axis=1) for h in range(H)
                ])
            return 2.0 * gamma * quad - mu

        def proj_simplex(v, theta0, n_sweeps):
            vm = v + nm
            theta = _packed_threshold(
                vm, 1.0, n_sweeps, theta0=theta0, n_valid=float(N)
            )
            return jnp.maximum(vm - theta, 0.0), theta

        w0, th_w0 = proj_simplex(
            jnp.broadcast_to(w_init[None], (H, NP, TB)), None, cold_iters
        )
        p0 = jnp.zeros_like(w0)

        def apply_D0(x):
            if H == 1:
                return x
            prev = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
            return x - prev

        def body(i, carry):
            w, p, th_w, tau_c, sig_c, alpha_c = carry
            vm = (w - tau_c * (grad_g(w) + apply_Dt(p))) + nm
            if warm and refresh > 1 and not params.adaptive:
                th_w = _sched_threshold(
                    vm, 1.0, th_w, (i % refresh) == 0, warm_iters - 1, N
                )
            else:
                th_w = _packed_threshold(
                    vm, 1.0, warm_iters,
                    theta0=th_w if warm else None, n_valid=float(N),
                )
            w_new = jnp.maximum(vm - th_w, 0.0)
            w_bar = 2.0 * w_new - w
            p_new = jnp.clip(p + sig_c * apply_D(w_bar), -c, c)
            if params.adaptive:
                # Residual balancing, same constants as the XLA body;
                # adapt_every > 1 skips the reductions off-schedule.
                def _bal(a):
                    dw, dp, tau_c, sig_c, alpha_c = a
                    pr = jnp.sqrt(jnp.sum(
                        (dw / tau_c - apply_Dt(dp)) ** 2, axis=(0, 1)
                    ))[None, None]
                    dr = jnp.sqrt(jnp.sum(
                        (dp / sig_c - apply_D0(dw)) ** 2, axis=(0, 1)
                    ))[None, None]
                    return _balance_steps(pr, dr, tau_c, sig_c, alpha_c)

                bal_args = (w - w_new, p - p_new, tau_c, sig_c, alpha_c)
                if params.adapt_every <= 1:
                    tau_c, sig_c, alpha_c = _bal(bal_args)
                else:
                    tau_c, sig_c, alpha_c = jax.lax.cond(
                        (i % params.adapt_every)
                        == params.adapt_every - 1,
                        _bal, lambda a: (a[2], a[3], a[4]), bal_args,
                    )
            if rho != 1.0:   # over-relaxation, matching the XLA body
                w_new = w + rho * (w_new - w)
                p_new = p + rho * (p_new - p)
            return (w_new, p_new, th_w, tau_c, sig_c, alpha_c)

        ones = jnp.ones((1, 1, TB), mu.dtype)
        carry = (w0, p0, th_w0, tau_p * ones, sigma * ones, 0.5 * ones)
        if unroll > 1:
            # Amortize Mosaic's fixed per-trip loop cost over ``unroll``
            # PDHG iterations (identical numerics: the same per-iteration
            # body runs with the true iteration index). At H=1 the body
            # is only ~4-8 vregs per full-width op, so the fixed cost
            # dominates a single-iteration trip — the roofline measured
            # 0.14-0.31 sustained vreg-ops/cycle there (RESULTS.md).
            n_trips, rem = divmod(params.max_iters, unroll)

            def body_u(t, c_):
                i0 = t * unroll
                for j in range(unroll):
                    c_ = body(i0 + j, c_)
                return c_

            carry = jax.lax.fori_loop(0, n_trips, body_u, carry)
            for j in range(rem):
                carry = body(n_trips * unroll + j, carry)
        else:
            carry = jax.lax.fori_loop(0, params.max_iters, body, carry)
        w, p, _, tau_f, _, _ = carry
        # One extra primal half-step so the wrapper can report the same
        # fixed-point residual / final iterate as the XLA solver.
        w_last, _ = proj_simplex(
            w - tau_f * (grad_g(w) + apply_Dt(p)), None, cold_iters
        )
        out_ref[:] = jnp.stack([w, w_last]) * valid2[None, None]

    return kernel


def solve_mpc_mean_variance_pallas_packed(
    current_weights: jax.Array,
    predicted_log_returns: jax.Array,
    cov_matrix: jax.Array,
    params: MPCParams,
    tile_b: Optional[int] = None,
    interpret: bool = False,
    unroll: Optional[int] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Batch-in-lanes fused mean-variance solve (Markowitz's program):
    [B, N] x [B, H, N] x [B or none, N, N] -> ([B, H, N], info).

    Numerics and info keys match solve_mpc_mean_variance_batch. An
    unbatched (or size-1-batched) covariance is NOT expanded to
    [B, N, N] in HBM: it rides VMEM once as a shared [NP, NP] block with
    a constant BlockSpec index map and the quadratic gradient becomes an
    MXU matmul. ``over_relax`` runs in-kernel; falls back to the XLA
    solver for allow_short, and when the per-problem covariance block cannot fit
    VMEM at the 128-lane tile (per-problem Sigma is NP*NP*128*4 bytes:
    fine to N~128, hopeless at 500; shared Sigma is 128x smaller).
    """
    from kmpc_tpu.ops.mpc import solve_mpc_mean_variance_batch

    reject_unhonored_polish(params, "solve_mpc_mean_variance_pallas_packed")
    B, H, N = predicted_log_returns.shape
    NP = ((N + 7) // 8) * 8
    dtype = jnp.float32
    shared_sigma = cov_matrix.ndim == 2 or (
        cov_matrix.ndim == 3 and cov_matrix.shape[0] == 1
    )
    if tile_b is None:
        # Sigma block + ~6 live [H, NP, TB] iterate arrays within ~8 MB.
        # H=1 (the Markowitz per-date shape) first tries a 256-lane tile:
        # the body is only ~4 vregs per full-width op there, so Mosaic
        # loop overhead dominates at 128 lanes — measured on v5e
        # (B=4096/N=30/1000 iters): 123.7k -> 136.2k solves/s (+10%;
        # tb=512 matched 256, tb=1024 overflowed the remote compile).
        # The 4 MB gate for the upsized tile is deliberately tighter
        # than the 8 MB base budget: Mosaic temporaries scale with the
        # tile and tb=1024's ~4.8 MB estimate already failed.
        def _need(tb):
            sig = NP * NP * 4 if shared_sigma else NP * NP * tb * 4
            return sig + (
                6 + _adaptive_extra_blocks(params)
            ) * H * NP * tb * 4

        def _pad_to(tb):
            return ((B + tb - 1) // tb) * tb

        if (H == 1 and B >= 256 and _need(256) <= 4 * 1024 * 1024
                and _pad_to(256) == _pad_to(128)):
            # The padding gate keeps the upsized tile from wasting lanes:
            # for B just above a multiple of 256 (e.g. 300 -> Bp 512 vs
            # 384 at tb=128) the 2x-padded batch would cost more than the
            # +10% per-lane win buys.
            tile_b = 256
        else:
            tile_b = 128 if _need(128) <= 8 * 1024 * 1024 else None
    if _needs_xla_fallback(params) or tile_b is None:
        return solve_mpc_mean_variance_batch(
            current_weights, predicted_log_returns, cov_matrix, params
        )
    interpret = interpret or jax.default_backend() == "cpu"

    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    mu = predicted_log_returns.astype(dtype)
    Sigma = 0.5 * (cov_matrix + jnp.swapaxes(cov_matrix, -1, -2))
    if shared_sigma:
        Sigma = Sigma.reshape(N, N).astype(dtype)
        sig_pad = jnp.pad(Sigma, ((0, NP - N), (0, NP - N)))
        sig_spec = pl.BlockSpec((NP, NP), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        Sigma = jnp.broadcast_to(Sigma.astype(dtype), (B, N, N))
        sig_pad = jnp.pad(jnp.transpose(Sigma, (1, 2, 0)),
                          ((0, NP - N), (0, NP - N), (0, Bp - B)))
        sig_spec = pl.BlockSpec((NP, NP, tile_b), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)

    mu_pad = jnp.pad(jnp.transpose(mu, (1, 2, 0)),
                     ((0, 0), (0, NP - N), (0, Bp - B)))
    cw_pad = jnp.pad(jnp.transpose(current_weights.astype(dtype), (1, 0)),
                     ((0, NP - N), (0, Bp - B)))

    cold_iters = 8 if N <= 64 else (12 if N <= 256 else 16)
    if unroll is None:
        # H=1 bodies are ~4-8 vregs per full-width op: Mosaic's fixed
        # per-trip loop cost dominates, so amortize it over 4 iterations
        # per trip (identical numerics; measured on v5e — see RESULTS.md
        # MV roofline row). Larger H amortizes naturally.
        unroll = 4 if (H == 1 and not params.adaptive) else 1
    kernel = _make_packed_mv_kernel(params, H, N, NP, cold_iters,
                                    shared_sigma=shared_sigma,
                                    unroll=max(1, unroll))
    grid = (Bp // tile_b,)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, H, NP, Bp), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NP, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, NP, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            sig_spec,
        ],
        out_specs=pl.BlockSpec(
            (2, H, NP, tile_b), lambda i: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(cw_pad, mu_pad, sig_pad)

    w = jnp.transpose(out[0, :, :N, :B], (2, 0, 1))        # [B, H, N]
    w_last = jnp.transpose(out[1, :, :N, :B], (2, 0, 1))
    w_init = current_weights.astype(dtype)

    # Same tail as the XLA solver (fp residual from the extra half-step,
    # hold-weights failure fallback, objective).
    fp_res = jnp.max(jnp.abs(w_last - w), axis=(-2, -1))
    converged = jnp.isfinite(fp_res)
    hold = jnp.broadcast_to(w_init[:, None, :], w_last.shape)
    w_out = jnp.where(converged[:, None, None], w_last, hold)

    u = w_out - jnp.concatenate(
        [w_init[:, None, :], w_out[:, :-1, :]], axis=1
    )
    quad = (
        jnp.einsum("btn,nm,btm->b", w_out, Sigma, w_out)
        if shared_sigma
        else jnp.einsum("btn,bnm,btm->b", w_out, Sigma, w_out)
    )
    obj = (
        jnp.einsum("btn,btn->b", w_out, mu)
        - params.gamma * quad
        - params.cost_coeff * jnp.sum(jnp.abs(u), axis=(-2, -1))
    )
    info = {"converged": converged, "fixed_point_residual": fp_res,
            "status_code": _status_code(fp_res, params.feas_tol),
            "objective": obj}
    return w_out, info

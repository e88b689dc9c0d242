#!/usr/bin/env python
"""Experiment bench for the uncertified cert-probe tail.

``build`` runs the f64 30k-iteration PDHG once on the 4 stuck instances
(idx 0, 8, 42, 48) and caches (w, p) in cert_tail_iterates.npz;
``probe`` applies the polish machinery to the cached iterates and prints
residuals + kink/Jacobian diagnostics. Iterating on the boundary-aware
Newton then costs seconds, not the 16-minute full verified path.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

IDX = [0, 8, 42, 48]
HERE = Path(__file__).resolve().parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "probe"])
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--ridge", type=float, default=1e-3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch

    d = np.load(HERE / "cert_probe_instances.npz")
    cw = jnp.asarray(d["cw"][IDX], jnp.float64)
    ys = jnp.asarray(d["ys"][IDX], jnp.float64)
    params = MPCParams(max_iters=args.iters, sigma_scale=2.0,
                       ridge=args.ridge)

    cache = HERE / "cert_tail_iterates.npz"
    if args.cmd == "build":
        t0 = time.perf_counter()
        w, info = solve_mpc_log_utility_batch(cw, ys, params)
        np.savez(cache, w=np.asarray(w), p=np.asarray(info["dual"]))
        print(f"built in {time.perf_counter() - t0:.1f}s; "
              f"fp_res {np.asarray(info['fixed_point_residual'])}")
        return

    it = np.load(cache)
    w = jnp.asarray(it["w"])
    p = jnp.asarray(it["p"])

    from kmpc_tpu.ops.mpc_polish import (
        polish_log_utility,
        _Q_with_margins,
        _proj_simplex_with_margin,
    )
    from kmpc_tpu.ops.mpc import _apply_D, _apply_Dt

    t0 = time.perf_counter()
    w_cur, p_cur = w, p
    cont = MPCParams(max_iters=2000, sigma_scale=2.0, ridge=args.ridge)
    for cycle in range(4):
        w_cur, info = polish_log_utility(w_cur, p_cur, cw, ys, params)
        p_cur = info["dual"]
        res = np.asarray(info["residual_after"])
        print(f"cycle {cycle}: residuals {[f'{r:.2e}' for r in res]}")
        if np.all(res < 1e-13):
            break
        w_cur, cinfo = solve_mpc_log_utility_batch(
            cw, ys, cont, w_warm=w_cur, p_warm=p_cur
        )
        p_cur = cinfo["dual"]
    print(f"polish wall {time.perf_counter() - t0:.1f}s")

    # Kink census at the final iterate.
    r = jnp.exp(ys)
    ridge = args.ridge
    r_norm2 = jnp.sum(r * r, axis=-1)
    r_min = jnp.min(r, axis=-1)
    L = jnp.max(r_norm2 / jnp.maximum(r_min, 1e-12) ** 2, axis=-1)
    L = L[..., None, None] + ridge
    sigma = params.sigma_scale * jnp.sqrt(L) / 2.0
    tau = params.step_scale / (0.5 * L + sigma * 4.0)
    c = params.cost_coeff
    tau_to = params.max_turnover

    port = jnp.sum(w_cur * r, axis=-1, keepdims=True)
    grad = -r / jnp.maximum(port, 1e-12) + ridge * w_cur
    vw = w_cur - tau * (grad + _apply_Dt(p_cur))
    Pw, mw = _proj_simplex_with_margin(vw)
    vp = p_cur + sigma * _apply_D(w_cur, cw)
    Qp, marg = _Q_with_margins(vp, sigma, c, tau_to)
    Rw = np.asarray(w_cur - Pw)
    Rp = np.asarray(p_cur - Qp)
    for k, i in enumerate(IDX):
        rw, rp = np.abs(Rw[k]).max(), np.abs(Rp[k]).max()
        ms = np.asarray(marg["ms"][k]) / float(np.asarray(sigma[k]))
        ma = np.asarray(marg["ma"][k])
        mo = np.asarray(marg["mo"][k])
        print(f"idx {i}: max|Rw| {rw:.2e} max|Rp| {rp:.2e} "
              f"|ms|<1e-8: {(np.abs(ms) < 1e-8).sum()} "
              f"|ma|<1e-10: {(np.abs(ma) < 1e-10).sum()} "
              f"mo: {np.squeeze(mo)}")
        # where does the residual live?
        tbad, nbad = np.unravel_index(np.argmax(np.abs(Rp[k])),
                                      Rp[k].shape)
        print(f"   argmax Rp at (t={tbad}, i={nbad}); "
              f"ms={ms[tbad, nbad]:.2e} ma={ma[tbad, nbad]:.2e} "
              f"u={np.asarray(_apply_D(w_cur, cw))[k, tbad, nbad]:.2e} "
              f"q={np.asarray(p_cur)[k, tbad, nbad]:.4e}")


if __name__ == "__main__":
    main()

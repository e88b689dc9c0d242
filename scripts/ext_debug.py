#!/usr/bin/env python
"""Debug driver for the extended-precision polish on the tie-class
attractor. ``build``: polish the cached 30k PDHG iterate of the
equal-weight instance to its f64 attractor and cache (w_iterate, dual).
``probe``: run _extended_polish_instance verbosely from the cached
attractor and report the f64 certificate residual."""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
HERE = Path(__file__).resolve().parent
STATE = HERE / "ext_debug_state.npz"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "probe"])
    ap.add_argument("--k", type=int, default=0,
                    help="position in cert_tail_lab's IDX list (0 = the "
                         "equal-weight tie instance)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch
    from kmpc_tpu.ops.mpc_polish import (
        _extended_polish_instance,
        _pair_residual,
        polish_log_utility,
    )

    d = np.load(HERE / "cert_probe_instances.npz")
    IDX = [0, 8, 42, 48]
    i = IDX[args.k]
    cw = jnp.asarray(d["cw"][[i]], jnp.float64)
    ys = jnp.asarray(d["ys"][[i]], jnp.float64)
    params = MPCParams(max_iters=30000, sigma_scale=2.0, ridge=1e-3)

    if args.cmd == "build":
        it = np.load(HERE / "cert_tail_iterates.npz")
        w_cur = jnp.asarray(it["w"][[args.k]])
        p_cur = jnp.asarray(it["p"][[args.k]])
        cont = MPCParams(max_iters=2000, sigma_scale=2.0, ridge=1e-3)
        for cycle in range(4):
            t0 = time.perf_counter()
            w_cur, info = polish_log_utility(w_cur, p_cur, cw, ys, params)
            p_cur = info["dual"]
            res = float(info["residual_after"][0])
            print(f"cycle {cycle}: res {res:.2e} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
            if res < 1e-13:
                break
            w_cur, cinfo = solve_mpc_log_utility_batch(
                cw, ys, cont, w_warm=w_cur, p_warm=p_cur
            )
            p_cur = cinfo["dual"]
        np.savez(STATE, w_it=np.asarray(info["w_iterate"][0]),
                 p=np.asarray(p_cur[0]), res=res,
                 cw=np.asarray(cw[0]), ys=np.asarray(ys[0]))
        print(f"cached attractor state at res {res:.2e}")
        return

    st = np.load(STATE)
    r = np.exp(st["ys"])
    r0 = _pair_residual(st["w_it"], st["p"], r, st["cw"], params)
    print(f"attractor pair residual (f64 eval): {r0:.2e}")
    t0 = time.perf_counter()
    out = _extended_polish_instance(st["w_it"], st["p"], st["cw"],
                                    st["ys"], params, verbose=True)
    print(f"extended wall {time.perf_counter()-t0:.1f}s")
    if out is None:
        print("unsupported")
        return
    r1 = _pair_residual(out[0], out[1], r, st["cw"], params)
    print(f"refined residual: {r1:.2e}  "
          f"{'CERTIFIED' if r1 < 1e-10 else 'still above'}")


if __name__ == "__main__":
    main()

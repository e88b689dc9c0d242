#!/usr/bin/env python
"""Escalated re-certification of uncertified parity-cache records.

For every polish-cache record with residual_after >= 1e-10, re-run the
verified pipeline at the probe setting (cycles=6 — more PDHG<->Newton
alternations before the fallback stages), then, if still uncertified,
an extra-deep warm f64 continuation (10x100k chunks plain + 5 chunks
over-relaxed rho=1.9, no early exit) followed by a final polish. Any
improvement REWRITES the instance's cache record in place, so the next
`parity_cdf.py --merge_only` picks it up. Provenance: this is the same
published pipeline with a larger budget — the escalation is recorded in
the artifact's provenance string.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    jax.config.update("jax_enable_x64", True)   # the deep-continuation
    # phase threads f64 iterates through the batch solver
    import jax.numpy as jnp

    from dataclasses import replace

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch
    from kmpc_tpu.ops.mpc_polish import (
        _pair_residual,
        polish_log_utility,
        solve_mpc_log_utility_batch_polished,
    )

    cache = Path("parity_cache/polish_realistic.jsonl")
    recs = [json.loads(line) for line in cache.open()]
    bad = sorted((r for r in recs if r["residual_after"] >= 1e-10),
                 key=lambda r: r["residual_after"])   # near-bar first
    print(f"{len(recs)} records, {len(bad)} uncertified:"
          f" {[r['idx'] for r in bad]}", flush=True)
    if not bad:
        return
    d = np.load("parity_cache/instances_realistic_1000.npz")
    params = MPCParams(max_iters=30000, sigma_scale=2.0, ridge=1e-3,
                       polish=True, polish_newton=4)
    updated = {}
    for rec in bad:
        i = rec["idx"]
        cw = d["cw"][[i]]
        ys = d["ys"][[i]]
        w6, info6 = solve_mpc_log_utility_batch_polished(
            jnp.asarray(cw), jnp.asarray(ys), params, cycles=6
        )
        res6 = float(np.asarray(info6["residual_after"])[0])
        best = (res6, np.asarray(w6)[0]) \
            if res6 < rec["residual_after"] \
            else (rec["residual_after"],
                  np.asarray(rec["w"]).reshape(ys.shape[1:]))
        print(f"idx {i}: cycles=6 -> {res6:.2e}", flush=True)
        if best[0] >= 1e-10:
            # extra-deep continuation from the cycles-6 iterate
            cw64 = jnp.asarray(cw, jnp.float64)
            ys64 = jnp.asarray(ys, jnp.float64)
            base = replace(params, polish=False)
            w_c = jnp.asarray(info6["w_iterate"])
            p_c = jnp.asarray(info6["dual"])
            r_np = np.exp(np.asarray(ys[0], np.float64))
            for rho, chunks in ((1.0, 10), (1.9, 5)):
                deep = replace(base, max_iters=100_000, over_relax=rho)
                for _ in range(chunks):
                    w_c, cinfo = solve_mpc_log_utility_batch(
                        cw64, ys64, deep, w_warm=w_c, p_warm=p_c
                    )
                    p_c = cinfo["dual"]
                    rr = _pair_residual(
                        np.asarray(w_c[0]), np.asarray(p_c[0]),
                        r_np, np.asarray(cw[0], np.float64), params,
                    )
                    if rr < 1e-12:
                        break
                w_p, pinfo = polish_log_utility(
                    w_c, p_c, cw64, ys64, base,
                    num_newton=params.polish_newton,
                )
                p_c = pinfo["dual"]
                rp = float(pinfo["residual_after"][0])
                print(f"idx {i}: deep rho={rho} -> {rp:.2e}", flush=True)
                if rp < best[0]:
                    best = (rp, np.asarray(w_p)[0])
                w_c = pinfo["w_iterate"]
                if best[0] < 1e-10:
                    break
        if best[0] < rec["residual_after"]:
            updated[i] = best
            print(f"idx {i}: improved {rec['residual_after']:.2e} -> "
                  f"{best[0]:.2e}"
                  f" {'CERTIFIED' if best[0] < 1e-10 else ''}", flush=True)
    if updated:
        out = []
        for r in recs:
            if r["idx"] in updated:
                res, w = updated[r["idx"]]
                r = dict(r, residual_after=res, w=w.ravel().tolist())
            out.append(r)
        with cache.open("w") as f:
            for r in out:
                f.write(json.dumps(r) + "\n")
        print(f"rewrote {len(updated)} records", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-5 MV H=1 attribution ladder (VERDICT weak #3: the 129.7k
mean-variance H=1 kernel sits at ~16% of the VPU issue ceiling with the
remaining latency source 'unattributed').

Builds a family of stripped H=1 kernels in the SAME layout/loop shape as
the production MV kernel (batch-in-lanes, [1, NP, TB] blocks, fori_loop
with the production unroll) and times each on the chip, so the
per-iteration cost splits into:

    carry-only      loop bookkeeping floor (body = one multiply-add)
    +sigma          + the Sigma@w quadratic-gradient product
    full (proj)     + the warm Michelot threshold (reduce chain) — the
                    production body minus the cond refresh schedule
    tile ladder     tb in {128, 256, 512} (lane-level ILP exposure)
    chain ladder    one [NP, k*tb] block processed as k INDEPENDENT
                    interleaved PDHG chains per body trip (explicit
                    cross-chain ILP: chain B's ops can issue in chain
                    A's dependence-stall slots)

Usage: python scripts/mv_ladder.py [--batch 4096] [--iters 1000]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--N", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kmpc_tpu.ops.mpc_pallas import _packed_threshold

    B, N, iters = args.batch, args.N, args.iters
    NP = ((N + 7) // 8) * 8
    gamma, c, ss = 5.0, 0.001, 2.0
    interpret = jax.default_backend() == "cpu"

    def make_kernel(tb, variant, unroll=4, chains=1):
        CTB = tb * chains

        def kernel(cw_ref, mu_ref, sig_ref, out_ref):
            mu_all = mu_ref[:]                          # [1, NP, CTB]
            cw_all = cw_ref[:]                          # [NP, CTB]
            sig_all = sig_ref[:]                        # [NP, NP, CTB]
            row = jax.lax.broadcasted_iota(jnp.int32, (NP, tb), 0)
            valid2 = (row < N).astype(mu_all.dtype)
            nm = jnp.where(row < N, 0.0, -1e30).astype(
                mu_all.dtype)[None]

            sl = [slice(k * tb, (k + 1) * tb) for k in range(chains)]
            mus = [mu_all[..., s] for s in sl]
            cws = [cw_all[..., s] for s in sl]
            sigs = [sig_all[..., s] for s in sl]
            consts = []
            for k in range(chains):
                fro = jnp.sqrt(jnp.sum(sigs[k] * sigs[k],
                                       axis=(0, 1)))[None, None]
                L = jnp.maximum(2.0 * gamma * fro, 1e-6)
                sg = ss * jnp.sqrt(L + 1.0) / 2.0
                consts.append((1.0 / (0.5 * L + sg * 4.0), sg))

            def grad_g(w, k):
                if variant == "carry":
                    return -mus[k]
                quad = jnp.sum(sigs[k] * w[0][None], axis=1)[None]
                return 2.0 * gamma * quad - mus[k]

            def one_chain(w, p, th, k):
                tau, sg = consts[k]
                if variant == "carry":
                    w2 = w - tau * (p - mus[k])
                    return w2, p + sg * (w2 - w), th
                vm = (w - tau * (grad_g(w, k) + p)) + nm
                if variant == "sigma":
                    w_new = jnp.maximum(vm, 0.0)
                else:
                    th = _packed_threshold(vm, 1.0, 1, theta0=th,
                                           n_valid=float(N))
                    w_new = jnp.maximum(vm - th, 0.0)
                w_bar = 2.0 * w_new - w
                p_new = jnp.clip(p + sg * (w_bar - cws[k][None]), -c, c)
                return w_new, p_new, th

            def body(i, carry):
                out = []
                for k in range(chains):
                    w, p, th = carry[3 * k:3 * k + 3]
                    out.extend(one_chain(w, p, th, k))
                return tuple(out)

            carry = []
            for k in range(chains):
                w0 = (jnp.broadcast_to(cws[k][None], (1, NP, tb))
                      * valid2[None])
                carry += [w0, jnp.zeros_like(w0),
                          jnp.zeros((1, 1, tb), mu_all.dtype)]
            carry = tuple(carry)
            n_trips = iters // unroll

            def body_u(t, c_):
                for j in range(unroll):
                    c_ = body(t * unroll + j, c_)
                return c_

            carry = jax.lax.fori_loop(0, n_trips, body_u, carry)
            out_ref[:] = jnp.concatenate(
                [carry[3 * k] for k in range(chains)], axis=-1
            ) * jnp.concatenate([valid2[None]] * chains, axis=-1)
        return kernel

    rng = np.random.default_rng(0)
    cw = rng.dirichlet(np.ones(N), size=B).astype(np.float32)
    mu = (rng.standard_normal((B, 1, N)) * 0.01).astype(np.float32)
    A = rng.standard_normal((B, N, N)) * 0.01
    sig = (np.einsum("bij,bkj->bik", A, A)
           + np.eye(N) * 1e-4).astype(np.float32)

    def run(tb, variant, unroll=4, chains=1):
        CTB = tb * chains
        Bp = ((B + CTB - 1) // CTB) * CTB
        cwp = jnp.asarray(np.pad(cw.T, ((0, NP - N), (0, Bp - B))))
        mup = jnp.asarray(np.pad(mu.transpose(1, 2, 0),
                                 ((0, 0), (0, NP - N), (0, Bp - B))))
        sigp = jnp.asarray(np.pad(sig.transpose(1, 2, 0),
                                  ((0, NP - N), (0, NP - N),
                                   (0, Bp - B))))
        kern = make_kernel(tb, variant, unroll=unroll, chains=chains)
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, NP, Bp), jnp.float32),
            grid=(Bp // CTB,),
            in_specs=[
                pl.BlockSpec((NP, CTB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP, CTB), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NP, NP, CTB), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NP, CTB), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )
        g = jax.jit(lambda a, b, s: jnp.sum(f(a, b, s)))
        float(g(cwp, mup, sigp))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(g(cwp, mup, sigp))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        # normalize per 128-lane-tile-iteration so variants compare
        lanes128 = Bp // 128
        us = med / iters / lanes128 * 1e6
        print(f"{variant:6s} tb={tb:4d} chains={chains} unroll={unroll}: "
              f"{med:.4f}s  {us:7.4f} us/iter/128lanes  "
              f"({B/med:,.0f} solves/s)", flush=True)
        return med

    print(f"B={B} N={N} iters={iters} (H=1 MV ladder)", flush=True)
    run(256, "carry")
    run(256, "sigma")
    run(256, "proj")
    run(256, "proj", unroll=1)
    run(128, "proj")
    run(512, "proj")
    run(128, "proj", chains=2)
    run(256, "proj", chains=2)
    run(128, "proj", chains=4)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training-step Amdahl ablation on the real chip (round-3 VERDICT
weak #6): where does the non-matmul time go at B=1024?

Measures, at the finance_sparse shape (obs=400, z=1024, T=10):
  full      fwd + bwd + AdamW update (the real train step)
  fwd_bwd   value_and_grad only (no optimizer)
  fwd       loss_sequence forward only
  fwd_noK   forward with the K-rollout replaced by a broadcast of z0
            (encoder/decoder/losses unchanged) — isolates the rollout
  fwd_kpow  forward with rollout_impl="kpower" (the suggested A/B)

Prints ONE JSON line with per-piece times and derived fractions.
jax.profiler traces do not survive this environment's remote-execution
relay, so the breakdown is measured by ablation instead — same Amdahl
arithmetic, real timings.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", type=str, default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from kmpc_tpu.config import get_config
    from kmpc_tpu.models import make_model
    from kmpc_tpu.train.loop import init_train_state, make_train_step
    from kmpc_tpu.utils.profiler import sync

    cfg = get_config("finance_sparse")
    cfg.TRAIN.BATCH_SIZE = args.batch
    cfg.TRAIN.DTYPE = args.dtype
    obs = len(cfg.ENV.FINANCE.TICKERS) * cfg.ENV.FINANCE.EMBEDDING_DIM
    model = make_model(cfg, obs)
    B, T = args.batch, cfg.TRAIN.SEQUENCE_LENGTH
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T + 1, obs),
                          jnp.float32)

    state = init_train_state(cfg, model, jax.random.PRNGKey(0))

    # Per-dispatch latency through the relay is ~30 ms — every measured
    # piece must amortize it or the ablation just measures the relay.
    # Each candidate fn(params, x) -> scalar is repeated K times INSIDE
    # one jitted program (fori_loop with a data dependence so XLA cannot
    # dead-code or hoist the repeats), exactly like the fused train
    # bench; reported time is per-application.
    K = 50

    def fused(fn):
        @jax.jit
        def run(p, xx):
            def body(i, acc):
                return acc + fn(p, xx + 0.0 * acc)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        return run

    def timed(fn, *a):
        out = fn(*a)
        sync(out)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            sync(out)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / K

    # full step: the existing fused multi-step program is the
    # reference timing (make_fused_finance_train_steps includes the
    # on-device batch sampling the real loop pays).
    from kmpc_tpu.train.loop import make_fused_finance_train_steps

    data = jax.random.normal(jax.random.PRNGKey(2), (4096, obs),
                             jnp.float32)
    fused_step = make_fused_finance_train_steps(cfg, model, K)
    st = state
    st, met = fused_step(st, jax.random.PRNGKey(3), 0, data)
    sync(met["loss"])
    times = []
    start = K
    for _ in range(args.reps):
        t0 = time.perf_counter()
        st, met = fused_step(st, jax.random.PRNGKey(3), start, data)
        sync(met["loss"])
        times.append(time.perf_counter() - t0)
        start += K
    t_full = float(np.median(times)) / K
    state = init_train_state(cfg, model, jax.random.PRNGKey(0))

    # fwd + bwd
    grad_fn = fused(
        lambda p, xx: jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)),
            jax.grad(lambda q: model.loss_sequence(q, xx)[0])(p), 0.0
        )
    )
    loss_fn = fused(lambda p, xx: model.loss_sequence(p, xx)[0])
    t_fwd_bwd = timed(grad_fn, state["params"], x)
    t_fwd = timed(loss_fn, state["params"], x)

    # fwd with the K-rollout ablated (broadcast z0 across the horizon):
    # encoder, decoder, every loss reduction unchanged — the delta vs
    # t_fwd is the rollout scan's cost (matmuls + scan overhead).
    def loss_noK(p, xx):
        z_seq = model.encode(p, xx)
        z0 = z_seq[:, 0, :]
        z_hat = jnp.broadcast_to(z0[:, None, :], z_seq.shape)
        x_tilde = model.decode(p, z_seq)
        x_hat = model.decode(p, z_hat)
        res = model._safe_norm(z_seq - z_hat)
        rec = model._safe_norm(xx - x_tilde)
        pred = model._safe_norm(xx - x_hat)
        spars = jnp.mean(jnp.abs(z_seq))
        return (jnp.mean(res) + jnp.mean(rec) + jnp.mean(pred) + spars)

    t_fwd_noK = timed(fused(loss_noK), state["params"], x)

    model_kp = dataclasses.replace(model, rollout_impl="kpower")
    t_fwd_kpow = timed(
        fused(lambda p, xx: model_kp.loss_sequence(p, xx)[0]),
        state["params"], x,
    )

    out = {
        "metric": "train_step_ablation_finance_sparse",
        "batch": B,
        "dtype": args.dtype,
        "reps": args.reps,
        "t_full_ms": round(t_full * 1e3, 3),
        "t_fwd_bwd_ms": round(t_fwd_bwd * 1e3, 3),
        "t_fwd_ms": round(t_fwd * 1e3, 3),
        "t_fwd_noK_ms": round(t_fwd_noK * 1e3, 3),
        "t_fwd_kpower_ms": round(t_fwd_kpow * 1e3, 3),
        "optimizer_frac": round(max(0.0, t_full - t_fwd_bwd) / t_full, 3),
        "bwd_frac": round(max(0.0, t_fwd_bwd - t_fwd) / t_full, 3),
        "fwd_frac": round(t_fwd / t_full, 3),
        "rollout_fwd_frac": round(max(0.0, t_fwd - t_fwd_noK) / t_full, 3),
        "kpower_vs_scan_fwd": round(t_fwd_kpow / t_fwd, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

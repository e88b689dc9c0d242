#!/usr/bin/env python
"""Measured weight-parity CDF: batched PDHG vs the interior-point oracle.

Quantifies the BASELINE.md:25 north star ("weight-trajectory parity
<= 1e-4 vs reference at same horizon") as a measured distribution
instead of an assertion. Instances:

- RANDOM: cw ~ Dirichlet(1), y ~ 0.01 N(0,1) + 5e-4 (the bench
  instance family, H=5, N=30).
- REALISTIC: per-date Koopman H-step forecasts on the synthetic
  finance test split (a briefly-trained GenericKM, the same
  predict_returns path the backtest engine uses) paired with
  realistically drifted pre-trade weights from a Koopman-MPC backtest.
  Uses the panel's native 20 assets (the reference default universe,
  reference: config.py:135-146).

Both sides solve the SAME program: the PDHG solver with the ridge
tie-breaker (MPCParams.ridge) and the trust-constr oracle with the
matching ridge term (ops/mpc_oracle.py). On the program's near-flat
optimal faces the ridge makes the optimum unique, so weight-level
disagreement measures solver error, not tie-breaking (reference
program: mpc.py:27-117 — no ridge; objective-level parity is reported
for ridge=0 too).

Metric: max-abs error of the FIRST weight row (the row a backtest
applies, reference: backtest.py:124-131) per instance; the CDF and the
fraction <= 1e-4 go to parity_cdf.json and RESULTS.md.

RESUMABLE PIPELINE (round 5): every expensive stage writes per-instance
records to ``--cache_dir`` (default parity_cache/) and skips work that
is already cached, so the flagship artifact is a multi-session
accumulation instead of an all-or-nothing run:

- instances_{family}_{n}.npz          the instance set (deterministic seed)
- oracle_{family}.jsonl               one record per oracle solve
- pdhg_{family}_{iters}.npz           the batched PDHG solves
- polish_{family}.jsonl               one record per POLISHED instance

The polished row is computed over however many instances the polish
cache holds; its processing order is a seeded permutation of the
instance set with the FIRST-REBALANCE (equal-weight 1/N) instance
force-included up front — the hardest certification class, so the
forced inclusion can only bias the certified fraction DOWN (documented
in the output provenance). Re-running with a larger ``--polish_n`` (or
more ``--budget_s``) extends the row; ``--merge_only`` recomputes the
artifact from the caches without new solves.

Usage:
    python parity_cdf.py --families realistic --n 1000 \
        --polish_n 320 --budget_s 3600 --out parity_cdf.json
"""

from __future__ import annotations

import argparse
import json
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

H, N = 5, 30


def make_random_instances(n, seed=0):
    rng = np.random.default_rng(seed)
    cw = rng.dirichlet(np.ones(N), size=n).astype(np.float32)
    ys = (rng.standard_normal((n, H, N)) * 0.01 + 5e-4).astype(np.float32)
    return cw, ys


def make_realistic_instances(n, seed=0, train_steps=300):
    """Koopman-forecast returns + drifted pre-trade weights from an
    actual backtest run — the instance distribution the MPC solver sees
    in production."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from kmpc_tpu.backtest.engine import (
        BacktestConfig,
        KoopmanMPCStrategy,
        run_backtest,
    )
    from kmpc_tpu.config import get_config
    from kmpc_tpu.data.finance import load_finance_data
    from kmpc_tpu.models import make_model
    from kmpc_tpu.ops.mpc import MPCParams
    from kmpc_tpu.ops.rollout import predict_returns
    from kmpc_tpu.train.loop import init_train_state, make_train_step

    cfg = get_config("finance_sparse")
    cfg.MODEL.TARGET_SIZE = 128          # small model: forecasts, not SOTA
    cfg.TRAIN.BATCH_SIZE = 32
    fd = load_finance_data(cfg)
    n_assets = fd.n_assets               # native 20-asset universe
    model = make_model(cfg, fd.observation_size)

    key = jax.random.PRNGKey(seed)
    init_key, data_key = jax.random.split(key)
    state = init_train_state(cfg, model, init_key)
    step_fn = make_train_step(cfg, model, dt=1.0)
    L = cfg.TRAIN.SEQUENCE_LENGTH if cfg.TRAIN.USE_SEQUENCE_LOSS else 1
    for step in range(train_steps):
        bkey = jax.random.fold_in(data_key, step)
        win = fd.sample_batch(bkey, "train", cfg.TRAIN.BATCH_SIZE, L)
        batch = win if cfg.TRAIN.USE_SEQUENCE_LOSS else (win[:, 0], win[:, 1])
        state, _ = step_fn(state, batch)
    params = state["params"]

    preds = predict_returns(model, params, fd.test, H, fd.n_assets,
                            fd.mean, fd.std)                  # [T, H, n]
    bt_cfg = BacktestConfig(HORIZON=H)
    strat = KoopmanMPCStrategy(
        model=model, params=params,
        mpc=MPCParams(max_iters=1000, sigma_scale=2.0,
                      proj_refresh_every=16),
    )
    hist = run_backtest(strat, fd, bt_cfg, return_dataframe=False)
    targets = np.asarray(hist["weights"])                       # [T, N]
    rets = np.asarray(
        fd.destandardize_returns(fd.extract_current_returns(fd.test))
    )
    T = targets.shape[0]
    # Pre-trade weights for date t = date t-1's target drifted by the
    # realized return (reference: backtest.py:202-208).
    cw = np.empty((T, n_assets), np.float32)
    cw[0] = 1.0 / n_assets
    simple = np.expm1(rets[1 : T + 1] if rets.shape[0] > T else rets[:T])
    for t in range(1, T):
        gross = targets[t - 1] * (1.0 + simple[t - 1])
        cw[t] = gross / max(gross.sum(), 1e-12)
    ys = np.asarray(preds)[:T].astype(np.float32)
    if T >= n:
        idx = np.linspace(0, T - 1, n).astype(int)
    else:
        idx = np.arange(T)
    return cw[idx], ys[idx]


# ---------------------------------------------------------------------------
# Cached stages
# ---------------------------------------------------------------------------


def get_instances(family, n, cache_dir):
    path = cache_dir / f"instances_{family}_{n}.npz"
    if path.exists():
        d = np.load(path)
        return d["cw"], d["ys"]
    print(f"[{family}] building {n} instances...", flush=True)
    if family == "random":
        cw, ys = make_random_instances(n)
    else:
        cw, ys = make_realistic_instances(n)
    np.savez(path, cw=cw, ys=ys)
    return cw, ys


def _read_jsonl(path):
    recs = {}
    if path.exists():
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    r = json.loads(line)
                    recs[r["idx"]] = r
    return recs


def _append_jsonl(path, recs):
    with open(path, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def _oracle_one(args):
    idx, cw, y, ridge = args
    from kmpc_tpu.ops.mpc_oracle import solve_mpc_log_utility_oracle

    w, info = solve_mpc_log_utility_oracle(
        np.asarray(cw, np.float64), np.asarray(y, np.float64), ridge=ridge
    )
    return {"idx": idx, "w": np.asarray(w).ravel().tolist(),
            "optimal": bool(info["status"] == "optimal")}


def solve_oracle_cached(family, cw, ys, ridge, cache_dir, workers=2):
    """Full [n, H, N] oracle solutions + optimal flags, resumable."""
    path = cache_dir / f"oracle_{family}.jsonl"
    recs = _read_jsonl(path)
    todo = [i for i in range(cw.shape[0]) if i not in recs]
    if todo:
        print(f"[{family}] oracle: {len(todo)} to solve "
              f"({len(recs)} cached)...", flush=True)
        jobs = [(i, cw[i], ys[i], ridge) for i in todo]
        with ProcessPoolExecutor(max_workers=workers) as pool:
            batch = []
            for out in pool.map(_oracle_one, jobs, chunksize=4):
                batch.append(out)
                if len(batch) >= 16:
                    _append_jsonl(path, batch)
                    batch = []
            _append_jsonl(path, batch)
        recs = _read_jsonl(path)
    h, n_ = ys.shape[1:]
    w = np.stack([np.asarray(recs[i]["w"]).reshape(h, n_)
                  for i in range(cw.shape[0])])
    ok = np.asarray([recs[i]["optimal"] for i in range(cw.shape[0])])
    return w, ok


def solve_pdhg_cached(family, cw, ys, ridge, iters, cache_dir):
    path = cache_dir / f"pdhg_{family}_{iters}.npz"
    if path.exists():
        d = np.load(path)
        if d["w"].shape[0] == cw.shape[0]:
            return d["w"], d["conv"]
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch

    print(f"[{family}] PDHG@{iters} on {cw.shape[0]} instances...",
          flush=True)
    params = MPCParams(max_iters=iters, sigma_scale=2.0, ridge=ridge)
    w, info = solve_mpc_log_utility_batch(jnp.asarray(cw), jnp.asarray(ys),
                                          params)
    w = np.asarray(w)
    conv = np.asarray(info["converged"])
    np.savez(path, w=w, conv=conv)
    return w, conv


def polish_order(n):
    """Deterministic processing order for the polished row: a seeded
    permutation with the first-rebalance (idx 0, equal-weight 1/N)
    instance force-included up front. Any prefix is an unbiased sample
    of the instance set except for the conservative idx-0 inclusion
    (the hardest certification class — reference: backtest.py:160-161)."""
    rng = np.random.default_rng(12345)
    perm = rng.permutation(n).tolist()
    perm.remove(0)
    return [0] + perm


def run_polish_chunks(family, cw, ys, ridge, iters, cycles, cache_dir,
                      polish_n, budget_s, chunk=16):
    """Run the verified path on chunks of the polish order until
    ``polish_n`` instances are cached or the time budget is exhausted."""
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams
    from kmpc_tpu.ops.mpc_polish import solve_mpc_log_utility_batch_polished

    path = cache_dir / f"polish_{family}.jsonl"
    recs = _read_jsonl(path)
    order = [i for i in polish_order(cw.shape[0]) if i not in recs]
    target = max(0, polish_n - len(recs))
    order = order[:target]
    if not order:
        return recs
    params = MPCParams(max_iters=iters, sigma_scale=2.0, ridge=ridge,
                       polish=True, polish_newton=4)
    t0 = time.monotonic()
    done = 0
    while order:
        if budget_s and time.monotonic() - t0 > budget_s:
            print(f"[{family}] polish budget exhausted after {done} "
                  f"instances this session", flush=True)
            break
        ids = order[:chunk]
        order = order[chunk:]
        w, info = solve_mpc_log_utility_batch_polished(
            jnp.asarray(cw[ids]), jnp.asarray(ys[ids]), params,
            cycles=cycles,
        )
        res = np.asarray(info["residual_after"])
        w = np.asarray(w)
        _append_jsonl(path, [
            {"idx": int(i), "w": w[k].ravel().tolist(),
             "residual_after": float(res[k])}
            for k, i in enumerate(ids)
        ])
        done += len(ids)
        ncert = int((res < 1e-10).sum())
        print(f"[{family}] polish chunk done ({done} this session, "
              f"{len(recs) + done} total): {ncert}/{len(ids)} certified, "
              f"max res {res.max():.2e}", flush=True)
    return _read_jsonl(path)


# ---------------------------------------------------------------------------
# Uncached one-shot helpers (tests / ad-hoc studies)
# ---------------------------------------------------------------------------


def solve_oracle(cw, ys, ridge, workers=2):
    """Full [n, H, N] oracle solutions + per-instance optimal flags
    (no cache — the resumable pipeline uses solve_oracle_cached)."""
    jobs = [(i, cw[i], ys[i], ridge) for i in range(cw.shape[0])]
    with ProcessPoolExecutor(max_workers=workers) as pool:
        out = list(pool.map(_oracle_one, jobs, chunksize=4))
    h, n_ = ys.shape[1:]
    w = np.stack([np.asarray(o["w"]).reshape(h, n_) for o in out])
    ok = np.asarray([o["optimal"] for o in out])
    return w, ok


def solve_pdhg(cw, ys, ridge, iters, polish=False, cycles=3):
    import jax.numpy as jnp

    from kmpc_tpu.ops.mpc import MPCParams, solve_mpc_log_utility_batch

    params = MPCParams(max_iters=iters, sigma_scale=2.0, ridge=ridge,
                       polish=polish, polish_newton=4)
    cwj = jnp.asarray(cw)
    ysj = jnp.asarray(ys)
    if polish:
        from kmpc_tpu.ops.mpc_polish import (
            solve_mpc_log_utility_batch_polished,
        )

        w, info = solve_mpc_log_utility_batch_polished(
            cwj, ysj, params, cycles=cycles
        )
        return np.asarray(w), np.asarray(info["residual_after"])
    w, info = solve_mpc_log_utility_batch(cwj, ysj, params)
    return np.asarray(w), np.asarray(info["converged"])


# ---------------------------------------------------------------------------
# Stats / merge
# ---------------------------------------------------------------------------


def ridged_objective(w, ys, cw, ridge, cost_coeff=0.001):
    """Min-form ridged objective, float64, per instance [n]."""
    w = np.asarray(w, np.float64)
    r = np.exp(np.asarray(ys, np.float64))
    port = np.maximum((w * r).sum(-1), 1e-300)
    prev = np.concatenate([np.asarray(cw, np.float64)[:, None], w[:, :-1]], 1)
    u = w - prev
    return (
        -np.log(port).sum(-1)
        + cost_coeff * np.abs(u).sum((-2, -1))
        + 0.5 * ridge * (w * w).sum((-2, -1))
    )


def cdf_stats(err):
    err = np.asarray(err)
    q = lambda p: float(np.quantile(err, p))  # noqa: E731
    return {
        "n": int(err.size),
        "median": q(0.5),
        "p90": q(0.9),
        "p99": q(0.99),
        "max": float(err.max()),
        "frac_le_1e-4": float(np.mean(err <= 1e-4)),
        "frac_le_1e-3": float(np.mean(err <= 1e-3)),
    }


def merge_family(family, cw, ys, ridge, iters_list, cache_dir):
    """Assemble one family's rows entirely from cached records."""
    h, n_ = ys.shape[1:]
    w_or, ok = solve_oracle_cached(family, cw, ys, ridge, cache_dir)
    obj_or = ridged_objective(w_or, ys, cw, ridge)
    fam = {"n": int(cw.shape[0]), "settings": {},
           "oracle_optimal_frac": float(ok.mean())}
    for iters in iters_list:
        w_pd, conv = solve_pdhg_cached(family, cw, ys, ridge, iters,
                                       cache_dir)
        err = np.max(np.abs(w_pd[:, 0, :] - w_or[:, 0, :]), axis=-1)
        gap = ridged_objective(w_pd, ys, cw, ridge) - obj_or
        fam["settings"][f"pdhg_{iters}"] = {
            **cdf_stats(err),
            "converged_frac": float(np.asarray(conv, float).mean()),
            "objective_gap_median": float(np.median(gap)),
            "objective_gap_p99": float(np.quantile(gap, 0.99)),
            "objective_gap_max": float(gap.max()),
        }
    recs = _read_jsonl(cache_dir / f"polish_{family}.jsonl")
    if recs:
        ids = sorted(recs)
        w_pp = np.stack([np.asarray(recs[i]["w"]).reshape(h, n_)
                         for i in ids])
        res_after = np.asarray([recs[i]["residual_after"] for i in ids])
        err = np.max(np.abs(w_pp[:, 0, :] - w_or[ids][:, 0, :]), axis=-1)
        obj_pp = ridged_objective(w_pp, ys[ids], cw[ids], ridge)
        dom = obj_pp - obj_or[ids]          # < 0: we beat the oracle
        fam["settings"][f"pdhg_{max(iters_list)}_polished"] = {
            **cdf_stats(err),
            "kkt_certified_frac": float(np.mean(res_after < 1e-10)),
            "residual_after_max": float(res_after.max()),
            "objective_leq_oracle_frac": float(np.mean(dom <= 1e-12)),
            "objective_margin_median": float(np.median(dom)),
            "objective_margin_max": float(dom.max()),
            "uncertified_idx": [int(i) for i, r in
                                zip(ids, res_after) if r >= 1e-10],
        }
    return fam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*",
                    default=["random", "realistic"])
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--ridge", type=float, default=1e-3)
    ap.add_argument("--iters", type=int, nargs="*", default=[1000, 30000])
    ap.add_argument("--polish_n", type=int, default=0,
                    help="target size of the POLISH=True verified row "
                         "(resumable; 0 = merge whatever is cached)")
    ap.add_argument("--polish_cycles", type=int, default=3)
    ap.add_argument("--budget_s", type=float, default=0,
                    help="wall-clock budget for NEW polish work this "
                         "session (0 = unlimited)")
    ap.add_argument("--cache_dir", type=str, default="parity_cache")
    ap.add_argument("--merge_only", action="store_true")
    ap.add_argument("--out", type=str, default="parity_cdf.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")

    cache_dir = Path(args.cache_dir)
    cache_dir.mkdir(exist_ok=True)

    results = {"ridge": args.ridge, "H": H, "N": N, "families": {},
               "provenance": {}}
    for family in args.families:
        cw, ys = get_instances(family, args.n, cache_dir)
        if not args.merge_only and args.polish_n:
            # Oracle + PDHG rows are built lazily by merge_family; run
            # the budgeted polish accumulation first so a killed session
            # still leaves complete per-instance records behind.
            solve_oracle_cached(family, cw, ys, args.ridge, cache_dir)
            run_polish_chunks(
                family, cw, ys, args.ridge, max(args.iters),
                args.polish_cycles, cache_dir, args.polish_n,
                args.budget_s,
            )
        results["families"][family] = merge_family(
            family, cw, ys, args.ridge, args.iters, cache_dir
        )
        npol = results["families"][family].get("settings", {}).get(
            f"pdhg_{max(args.iters)}_polished", {}).get("n", 0)
        results["provenance"][family] = (
            f"regenerated end-to-end from per-instance caches in "
            f"{args.cache_dir}/ (oracle/pdhg n={cw.shape[0]}, polished "
            f"n={npol} accumulated over sessions; polish order: seeded "
            f"permutation with the equal-weight first-rebalance "
            f"instance force-included first)"
        )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Standalone checkpoint evaluation CLI (reference: evaluate_checkpoints.py).

Loads one or more checkpoints from a run directory and runs the
standardized evaluation protocol on the requested system(s).

Usage:
    python evaluate_checkpoints.py --run_dir runs/kae/<ts> --system duffing
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_dir", type=str, required=True)
    parser.add_argument("--system", type=str, default=None,
                        help="system to evaluate (default: the run's ENV_NAME)")
    parser.add_argument("--checkpoints", type=str, nargs="*",
                        default=["checkpoint", "last"],
                        help="checkpoint subdirectories to evaluate")
    parser.add_argument("--horizons", type=int, nargs="*", default=[100, 1000])
    parser.add_argument("--batch_size", type=int, default=100)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--allow_pickle", action="store_true",
                        help="permit full unpickling of .pt checkpoints that "
                             "fail the safe weights_only load (runs code "
                             "embedded in the file; trusted files only)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from kmpc_tpu.config import Config
    from kmpc_tpu.eval.evaluation import EvaluationSettings, evaluate_model
    from kmpc_tpu.models import make_model
    from kmpc_tpu.train.loop import evaluate_finance
    from kmpc_tpu.utils.checkpoint import load_params_any

    run_dir = Path(args.run_dir)
    torch_cache = {}  # pt filename -> loaded payload (avoid double loads)
    if (run_dir / "config.json").exists():
        cfg = Config.from_json(str(run_dir / "config.json"))
    else:
        # Reference-format run dir with only torch checkpoints: pull the
        # config from the first checkpoint.pt (reference: train.py:475-492).
        from kmpc_tpu.utils.torch_import import load_torch_checkpoint

        pts = [run_dir / f"{n}.pt" for n in args.checkpoints]
        pts = [p for p in pts if p.exists()]
        if not pts:
            raise FileNotFoundError(
                f"No config.json or {args.checkpoints}.pt under {run_dir}"
            )
        torch_cache[pts[0].name] = load_torch_checkpoint(
            str(pts[0]), allow_pickle=args.allow_pickle
        )
        cfg = torch_cache[pts[0].name]["config"]
    system_name = args.system or cfg.ENV.ENV_NAME
    is_finance = system_name.lower() == "finance"

    if is_finance:
        from kmpc_tpu.data.finance import load_finance_data

        fd = load_finance_data(cfg)
        model = make_model(cfg, fd.observation_size)
        test_init, test_future = fd.get_test_sequences(
            num_sequences=min(args.batch_size, fd.test.shape[0] // 2),
            max_length=max(args.horizons),
        )
    else:
        from kmpc_tpu.data.systems import make_system

        system = make_system(cfg, system_name)
        model = make_model(cfg, system.observation_size)
        settings = EvaluationSettings(
            systems=(system_name,),
            horizons=tuple(args.horizons),
            batch_size=args.batch_size,
        )

    summary = {}
    for name in args.checkpoints:
        ckpt_dir = run_dir / name
        pt_file = run_dir / f"{name}.pt"
        if (ckpt_dir / "arrays.npz").exists():
            eval_model = model
            params, step, _ = load_params_any(
                ckpt_dir, cfg, model, seed=cfg.SEED
            )
        elif pt_file.exists():
            # Reference torch checkpoint (train.py:475-492 format).
            if pt_file.name in torch_cache:
                ckpt = torch_cache[pt_file.name]
                params = ckpt["params"]
                step = ckpt.get("step")
                step = int(step) if step is not None else -1
            else:
                params, step, ckpt = load_params_any(
                    pt_file, cfg, model, allow_pickle=args.allow_pickle
                )
            # Evaluate with the model built from the checkpoint's OWN
            # embedded config: shape-preserving fields that live in config
            # rather than params (activation, norm_fn, LISTA loops/alpha/L)
            # could otherwise silently diverge from the run dir's
            # config.json (reference embeds the config at train.py:475-492).
            eval_model = ckpt["model"]
            if is_finance:
                from kmpc_tpu.utils.torch_import import (
                    check_finance_compatibility,
                )

                check_finance_compatibility(fd, ckpt)
        else:
            print(f"Skipping {name}: not found at {ckpt_dir} or {pt_file}")
            continue
        print(f"Evaluating '{name}' (step {step}) on {system_name}...")
        if is_finance:
            res = evaluate_finance(
                eval_model, params, test_init, test_future,
                max_horizon=max(args.horizons),
            )
            results = {
                "mean_mses": res["mean_mses"],
                "best_mode": res["best_mode"],
                "best_mse": res["best_mse"],
                "mse_curves": {k: v.tolist() for k, v in res["mse_curves"].items()},
            }
            print(f"  best mode: {res['best_mode']} (MSE {res['best_mse']:.4e})")
        else:
            out_dir = run_dir / f"evaluation_{name}"
            results = evaluate_model(
                eval_model, params, cfg, settings, output_dir=out_dir
            )
            sys_res = results.get(system_name, {})
            for horizon in args.horizons:
                hk = str(horizon)
                modes = sys_res.get("modes", {})
                nr = modes.get("no_reencode", {}).get("horizons", {}).get(hk)
                es = modes.get("every_step", {}).get("horizons", {}).get(hk)
                if nr and es:
                    print(f"  H={horizon}: no-reencode={nr['mean']:.4e} "
                          f"every-step={es['mean']:.4e}")
        results_file = run_dir / f"evaluation_results_{name}.json"
        with open(results_file, "w") as f:
            json.dump(results, f, indent=2)
        summary[name] = {
            "step": step,
            "results_file": str(results_file),
        }

    with open(run_dir / "evaluation_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(f"Summary written to {run_dir / 'evaluation_summary.json'}")


if __name__ == "__main__":
    main()

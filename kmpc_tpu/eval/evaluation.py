"""Standardized evaluation protocol: rollout modes, horizon MSE, plots.

TPU-native rebuild of the reference evaluation module
(reference: evaluation.py:44-1078). The three rollout modes run as one
jitted scan each (ops/rollout.py) over the full batch of initial
conditions; metrics are NaN-masked horizon MSEs aggregated across
initial conditions with best-periodic-period selection per horizon.
Plots stay host-side matplotlib (SURVEY.md §7: crisp device/host
boundary).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kmpc_tpu.config import Config
from kmpc_tpu.data.systems import make_system
from kmpc_tpu.models.koopman import KoopmanModel
from kmpc_tpu.ops.rollout import rollout


# ---------------------------------------------------------------------------
# Metric helpers (reference: evaluation.py:142-181)
# ---------------------------------------------------------------------------


def compute_horizon_mse(
    squared_errors: np.ndarray, horizon: int
) -> Tuple[float, float, List[float], int]:
    """Mean +/- std MSE over ICs for one horizon, NaN-masked.

    squared_errors: [time, batch] per-step squared L2 norms.
    """
    horizon = min(horizon, squared_errors.shape[0])
    per_ic = np.nanmean(squared_errors[:horizon], axis=0)
    valid = np.isfinite(per_ic)
    if valid.sum() == 0:
        return float("nan"), float("nan"), [], 0
    vals = per_ic[valid]
    mean = float(vals.mean())
    std = float(vals.std()) if vals.size > 1 else 0.0
    return mean, std, vals.tolist(), int(valid.sum())


def cumulative_mse_curve(squared_errors: np.ndarray) -> List[float]:
    """Cumulative MSE averaged across ICs (reference: evaluation.py:173-181)."""
    steps = np.arange(1, squared_errors.shape[0] + 1, dtype=np.float64)
    cumulative = np.cumsum(squared_errors, axis=0)
    with np.errstate(invalid="ignore"):
        curve = np.nanmean(cumulative / steps[:, None], axis=1)
    return curve.tolist()


# ---------------------------------------------------------------------------
# Settings (reference: evaluation.py:834-853)
# ---------------------------------------------------------------------------


@dataclass
class EvaluationSettings:
    systems: Sequence[str] = ("duffing", "lyapunov")
    horizons: Sequence[int] = (100, 1000)
    periodic_reencode_periods: Sequence[int] = (10, 25, 50, 100)
    batch_size: int = 100
    phase_portrait_samples: int = 20
    phase_portrait_length: int = 200
    phase_portrait_reencode_periods: Sequence[int] = (0, 1, 10, 25, 50)
    phase_portrait_batch_size: int = 256
    seed_offset: int = 12345


# ---------------------------------------------------------------------------
# Main protocol (reference: evaluation.py:856-1078)
# ---------------------------------------------------------------------------


def evaluate_model(
    model: KoopmanModel,
    params: Dict,
    cfg: Config,
    settings: Optional[EvaluationSettings] = None,
    output_dir: Optional[Path] = None,
    verbose: bool = True,
) -> Dict[str, Dict]:
    """Evaluate a trained Koopman model across systems/modes/horizons."""
    if settings is None:
        settings = EvaluationSettings()
    max_horizon = max(settings.horizons)
    results: Dict[str, Dict] = {}

    for system_name in settings.systems:
        system = make_system(cfg, system_name)
        if system.observation_size != model.observation_size:
            if verbose:
                print(
                    f"[evaluate_model] skip '{system_name}': obs "
                    f"{system.observation_size} != model {model.observation_size}"
                )
            continue
        if verbose:
            print(f"[evaluate_model] system '{system_name}' "
                  f"(batch={settings.batch_size}, horizon={max_horizon})")

        key = jax.random.PRNGKey(cfg.SEED + settings.seed_offset)
        init_states = system.reset(key, settings.batch_size)
        true_future = np.asarray(system.trajectory(init_states, max_horizon))

        predictions: Dict[str, np.ndarray] = {}
        predictions["no_reencode"] = np.asarray(
            rollout(model, params, init_states, max_horizon, 0)
        )
        predictions["every_step"] = np.asarray(
            rollout(model, params, init_states, max_horizon, 1)
        )
        for period in settings.periodic_reencode_periods:
            predictions[f"periodic_{period}"] = np.asarray(
                rollout(model, params, init_states, max_horizon, period)
            )

        mode_metrics: Dict[str, Dict] = {}
        periodic_summary = {str(h): {} for h in settings.horizons}
        per_step_errors: Dict[str, np.ndarray] = {}

        for mode_name, pred in predictions.items():
            diff = pred - true_future
            per_step_errors[mode_name] = np.nanmean(
                np.linalg.norm(diff, axis=-1), axis=1
            )
            squared = np.sum(diff**2, axis=-1)
            squared = np.where(np.isfinite(squared), squared, np.nan)

            horizons_metrics = {}
            for horizon in settings.horizons:
                # Parabolic decays to the origin too fast for the 1000-step
                # metric to be meaningful (reference: evaluation.py:958-960).
                if system_name == "parabolic" and horizon > 100:
                    continue
                mean, std, per_ic, num_valid = compute_horizon_mse(squared, horizon)
                horizons_metrics[str(horizon)] = {
                    "mean": mean, "std": std,
                    "num_valid": num_valid, "values": per_ic,
                }
                if mode_name.startswith("periodic_") and num_valid > 0:
                    periodic_summary[str(horizon)][mode_name] = mean

            mode_metrics[mode_name] = {
                "horizons": horizons_metrics,
                "mse_curve": cumulative_mse_curve(squared),
            }

        best_periodic: Dict[str, Dict] = {}
        for horizon in settings.horizons:
            hk = str(horizon)
            if system_name == "parabolic" and horizon > 100:
                continue
            candidates = periodic_summary[hk]
            if not candidates:
                continue
            best_mode = min(candidates.items(), key=lambda kv: kv[1])
            best_periodic[hk] = {"mode": best_mode[0], "mean": best_mode[1]}

        files: Dict[str, str] = {}
        if output_dir is not None:
            system_dir = Path(output_dir) / system_name
            system_dir.mkdir(parents=True, exist_ok=True)
            try:
                files = _save_system_plots(
                    model, params, system, cfg, settings,
                    true_future, predictions, per_step_errors,
                    mode_metrics, system_dir,
                )
            except Exception as e:  # pragma: no cover - plots best-effort
                print(f"[warn] plotting failed for {system_name}: {e}")

        results[system_name] = {
            "modes": mode_metrics,
            "best_periodic": best_periodic,
            "files": files,
        }

    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        metrics_path = output_dir / "metrics.json"
        with open(metrics_path, "w") as f:
            json.dump(results, f, indent=2)
        results["metrics_file"] = str(metrics_path)
    return results


# ---------------------------------------------------------------------------
# Plotting (reference: evaluation.py:197-831 — host-side, best-effort)
# ---------------------------------------------------------------------------


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _save_system_plots(
    model, params, system, cfg, settings,
    true_future, predictions, per_step_errors, mode_metrics, system_dir,
) -> Dict[str, str]:
    files: Dict[str, str] = {}

    path = system_dir / "phase_portrait_plot_eval.png"
    _save_phase_portrait_grid(model, params, system, settings, path)
    files["phase_portrait_plot_eval"] = str(path)

    path = system_dir / "phase_portrait_overlay.png"
    _save_phase_portrait_overlay(true_future, predictions, path,
                                 max_samples=settings.phase_portrait_samples)
    files["phase_portrait_overlay"] = str(path)

    # One portrait per rollout mode (reference: evaluation.py:282-345).
    for mode_name, pred in predictions.items():
        p = system_dir / f"phase_portrait_{mode_name}.png"
        _save_phase_portrait_single_mode(
            true_future, pred, p,
            max_samples=settings.phase_portrait_samples,
            title=f"Phase portrait ({mode_name})",
        )
        if p.exists():
            files[f"phase_portrait_{mode_name}"] = str(p)

    path = system_dir / "mse_vs_horizon.png"
    _save_mse_curves(
        {m: d["mse_curve"] for m, d in mode_metrics.items()}, settings.horizons, path
    )
    files["mse_curve"] = str(path)

    for mode_name, errors in per_step_errors.items():
        p = system_dir / f"error_curve_{mode_name}.png"
        _save_error_curve({mode_name: errors}, p, f"Per-step error ({mode_name})")
        files[f"error_curve_{mode_name}"] = str(p)

    path = system_dir / "error_curve_combined.png"
    _save_error_curve(per_step_errors, path, "Per-step error (all modes)",
                      highlight=settings.horizons)
    files["error_curve_combined"] = str(path)

    if system.name == "lyapunov":
        lyap_files = _save_lyapunov_comparison(model, params, system, system_dir)
        files.update(lyap_files)
    return files


def _save_phase_portrait_overlay(
    true_future: np.ndarray,
    predictions: Dict[str, np.ndarray],
    path: Path,
    max_samples: int = 20,
) -> None:
    """All rollout modes overlaid on one axes with ground truth in
    transparent gray (reference: evaluation.py:197-279). Trajectories
    with any non-finite prediction in any mode are dropped."""
    if true_future.shape[-1] < 2:
        return
    plt = _mpl()
    batch = true_future.shape[1]
    finite = np.ones(batch, dtype=bool)
    for pred in predictions.values():
        finite &= np.isfinite(pred.reshape(pred.shape[0], batch, -1)).all(
            axis=(0, 2)
        )
    idx = np.nonzero(finite)[0][:max_samples]
    if len(idx) == 0:
        return

    fig, ax = plt.subplots(figsize=(7, 6))
    for b in idx:
        ax.plot(true_future[:, b, 0], true_future[:, b, 1],
                color=(0.5, 0.5, 0.5), alpha=0.25, lw=1.5)
    cmap = plt.get_cmap("tab10")
    for k, (mode, pred) in enumerate(sorted(predictions.items())):
        for j, b in enumerate(idx):
            ax.plot(pred[:, b, 0], pred[:, b, 1], color=cmap(k % 10),
                    alpha=0.6, lw=0.9, label=mode if j == 0 else None)
    ax.set_xlabel("x1")
    ax.set_ylabel("x2")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def _save_phase_portrait_single_mode(
    true_future: np.ndarray,
    predicted: np.ndarray,
    path: Path,
    max_samples: int = 20,
    title: Optional[str] = None,
    axis_lim: float = 2.5,
) -> None:
    """One rollout mode, each trajectory in its own tab20 color with
    ground truth in light gray on top (reference: evaluation.py:282-345;
    same finite-filter, layering, limits and equal-aspect semantics).

    true_future / predicted: [time, batch, state_dim].
    """
    if true_future.shape[-1] < 2:
        return
    plt = _mpl()
    batch = predicted.shape[1]
    finite = np.isfinite(
        predicted.reshape(predicted.shape[0], batch, -1)
    ).all(axis=(0, 2))
    idx = np.nonzero(finite)[0][:max_samples]
    if len(idx) == 0:
        return

    fig, ax = plt.subplots(1, 1, figsize=(7, 6))
    cmap = plt.get_cmap("tab20", len(idx))
    for j, b in enumerate(idx):
        ax.plot(predicted[:, b, 0], predicted[:, b, 1],
                color=cmap(j), linewidth=1.5, zorder=2)
        ax.plot(true_future[:, b, 0], true_future[:, b, 1],
                color=(0.6, 0.6, 0.6), alpha=0.5, linewidth=1.5, zorder=3)
    ax.set_xlabel("x1")
    ax.set_ylabel("x2")
    ax.set_title(title or "Phase portrait (single mode)")
    ax.set_xlim(-axis_lim, axis_lim)
    ax.set_ylim(-axis_lim, axis_lim)
    ax.set_aspect("equal", adjustable="box")
    ax.grid(True, linestyle=":", alpha=0.4)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def _save_phase_portrait_grid(model, params, system, settings, path: Path):
    """Grid of phase portraits: ground truth vs each reencode mode
    (reference: evaluation.py:781-831)."""
    plt = _mpl()
    n = settings.phase_portrait_samples
    length = settings.phase_portrait_length
    key = jax.random.PRNGKey(settings.seed_offset + 1)
    x0 = system.reset(key, n)
    true = np.asarray(system.trajectory(x0, length))      # [T, B, D]
    x0n = np.asarray(x0)

    periods = list(settings.phase_portrait_reencode_periods)
    fig, axes = plt.subplots(1, len(periods) + 1, figsize=(4 * (len(periods) + 1), 4))
    axes[0].set_title("ground truth")
    for b in range(n):
        axes[0].plot(
            np.concatenate([[x0n[b, 0]], true[:, b, 0]]),
            np.concatenate([[x0n[b, 1]], true[:, b, 1]]),
            color="gray", alpha=0.4, lw=1.0,
        )
    for ax, period in zip(axes[1:], periods):
        pred = np.asarray(rollout(model, params, x0, length, period))
        label = {0: "no reencode", 1: "every step"}.get(period, f"periodic {period}")
        ax.set_title(label)
        for b in range(n):
            ax.plot(true[:, b, 0], true[:, b, 1], color="gray", alpha=0.2, lw=1.0)
            ax.plot(pred[:, b, 0], pred[:, b, 1], lw=1.0)
    for ax in axes:
        ax.set_xlabel("x1")
        ax.set_ylabel("x2")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def _save_mse_curves(curves: Dict[str, List[float]], horizons, path: Path):
    """MSE-vs-horizon curves (reference: evaluation.py:347-370)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 5))
    for mode, curve in curves.items():
        ax.plot(np.arange(1, len(curve) + 1), curve, label=mode, lw=1.2)
    for h in horizons:
        ax.axvline(h, color="k", ls=":", alpha=0.3)
    ax.set_xlabel("horizon")
    ax.set_ylabel("cumulative MSE")
    ax.set_yscale("log")
    ax.set_xscale("log")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def _save_error_curve(errors: Dict[str, np.ndarray], path: Path, title: str,
                      highlight=()):
    """Per-step error curves (reference: evaluation.py:373-430)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 5))
    for mode, err in errors.items():
        ax.plot(err, label=mode, lw=1.2)
    for h in highlight:
        if h <= max(len(e) for e in errors.values()):
            ax.axvline(h, color="k", ls=":", alpha=0.3)
    ax.set_xlabel("step")
    ax.set_ylabel("mean L2 error")
    ax.set_title(title)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def _estimate_attractors(trajectories: np.ndarray, decimals: int = 1) -> np.ndarray:
    """Cluster rollout endpoints into attractor estimates
    (reference: evaluation.py:461-517)."""
    finals = trajectories[-1]                             # [B, D]
    finals = finals[np.all(np.isfinite(finals), axis=-1)]
    if len(finals) == 0:
        return np.zeros((0, trajectories.shape[-1]))
    rounded = np.round(finals, decimals)
    return np.unique(rounded, axis=0)


def _save_vector_magnitude_histogram(magnitudes, path: Path, title: str):
    """Histogram of vector-field magnitudes (reference: evaluation.py:433-458)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(6, 4))
    mags = np.asarray(magnitudes).ravel()
    mags = mags[np.isfinite(mags)]
    if len(mags):
        ax.hist(mags, bins=50, alpha=0.8, density=True)
    ax.set_xlabel("|dx/dt|")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def _save_lyapunov_comparison(
    model, params, system, system_dir: Path,
    num_trajectories: int = 12, grid_lim: float = 3.0, grid_n: int = 15,
) -> Dict[str, str]:
    """True-vs-learned attractor comparison with Voronoi-region
    rendering, vector-field quivers, nearest-attractor-colored
    trajectories, per-panel magnitude histograms, and a basin-assignment
    grid (reference: evaluation.py:433-724). The reference evaluates the
    15x15 vector grid and every trajectory one sample at a time; here
    each panel's grid is ONE batched step and the trajectories are one
    batched scan."""
    plt = _mpl()
    from matplotlib import cm
    from scipy.spatial import Voronoi, cKDTree

    files: Dict[str, str] = {}
    dt = float(system.dt)
    steps = max(int(8.0 / dt), 75)

    # True attractor points come from the system's definition; learned
    # ones are estimated from rollout endpoints (reference:
    # evaluation.py:461-517).
    from kmpc_tpu.data.systems import _LYAPUNOV_POINTS

    true_points = np.asarray(_LYAPUNOV_POINTS)
    est_key = jax.random.PRNGKey(777)
    est_x0 = jax.random.uniform(
        est_key, (max(grid_n**2, 64), 2), minval=-grid_lim, maxval=grid_lim
    )
    est_traj = np.asarray(rollout(model, params, est_x0, steps, 1))
    learned_points = _estimate_attractors(est_traj)
    # Tolerance-cluster like the reference (0.2 ball): greedy dedup.
    if len(learned_points):
        kept = []
        for p in learned_points:
            if not kept or np.min(
                np.linalg.norm(np.asarray(kept) - p, axis=-1)
            ) > 0.2:
                kept.append(p)
        learned_points = np.asarray(kept)

    # Vector-field grids (one batched evaluation per panel).
    xs = np.linspace(-grid_lim, grid_lim, grid_n)
    X, Y = np.meshgrid(xs, xs)
    grid_states = jnp.asarray(
        np.stack([X.ravel(), Y.ravel()], axis=-1), dtype=jnp.float32
    )
    vel_true = (np.asarray(system.step(grid_states)) - np.asarray(grid_states)) / dt
    vel_learned = (
        np.asarray(model.step_env(params, grid_states)) - np.asarray(grid_states)
    ) / dt

    # Trajectory fans from random ICs (one batched scan per panel).
    rng = np.random.default_rng(42)
    x0 = jnp.asarray(
        rng.uniform(-2.5, 2.5, size=(num_trajectories, 2)), jnp.float32
    )
    traj_true = np.concatenate(
        [np.asarray(x0)[None], np.asarray(system.trajectory(x0, steps))], 0
    )
    traj_learned = np.concatenate(
        [np.asarray(x0)[None], np.asarray(rollout(model, params, x0, steps, 1))], 0
    )

    fig, axes = plt.subplots(1, 2, figsize=(20, 8))
    panels = [
        (axes[0], "True System", true_points, vel_true, traj_true, "o", 0.25),
        (axes[1], "Learned System", learned_points, vel_learned,
         traj_learned, "s", 0.2),
    ]
    for ax, title, points, vel, trajs, marker, fill_alpha in panels:
        display = points if len(points) else true_points
        colors = cm.tab20(np.linspace(0, 1, max(len(display), 1)))

        # Voronoi regions of the attractor points (reference:
        # evaluation.py:579-604).
        if len(display) >= 3:
            vor = Voronoi(display)
            for i, region_idx in enumerate(vor.point_region):
                region = vor.regions[region_idx]
                if not region or -1 in region:
                    continue
                verts = np.asarray([vor.vertices[j] for j in region])
                if len(verts):
                    ax.fill(verts[:, 0], verts[:, 1],
                            color=colors[i % len(colors)],
                            alpha=fill_alpha, zorder=1)
            for simplex in vor.ridge_vertices:
                simplex = np.asarray(simplex)
                if np.all(simplex >= 0):
                    ax.plot(vor.vertices[simplex, 0], vor.vertices[simplex, 1],
                            "k-", linewidth=1.0, alpha=0.75, zorder=2)

        U = vel[:, 0].reshape(grid_n, grid_n)
        V = vel[:, 1].reshape(grid_n, grid_n)
        mags = np.sqrt(U**2 + V**2)
        den = np.where(mags == 0, 1.0, mags)
        max_mag = float(np.nanmax(mags)) if mags.size else 0.0
        lws = (0.75 + 2.25 * (mags / (max_mag + 1e-6))
               if max_mag > 0 else np.full_like(mags, 0.75))
        ax.quiver(X, Y, U / den, V / den, color="gray", alpha=0.65,
                  scale=25, linewidths=lws.ravel(), zorder=3)

        suffix = "learned" if title.startswith("Learned") else "true"
        hist_path = system_dir / f"phase_portrait_vector_hist_{suffix}.png"
        _save_vector_magnitude_histogram(
            mags, hist_path, f"{title} vector magnitudes"
        )
        files[f"phase_portrait_vector_hist_{suffix}"] = str(hist_path)

        for k, p in enumerate(display):
            ax.plot(p[0], p[1], marker, color=colors[k % len(colors)],
                    markersize=10, markeredgecolor="black",
                    markeredgewidth=2, zorder=6)

        # Trajectories colored by nearest attractor of the panel.
        for b in range(trajs.shape[1]):
            t = trajs[:, b]
            t = t[np.all(np.isfinite(t), axis=-1)]
            if len(t) == 0:
                continue
            dists = np.linalg.norm(display - t[-1], axis=-1)
            color = colors[int(np.argmin(dists)) % len(colors)]
            ax.plot(t[:, 0], t[:, 1], color=color, lw=2.0, alpha=0.9, zorder=4)
            ax.plot(t[0, 0], t[0, 1], marker, color=color, markersize=6,
                    alpha=0.9, markeredgecolor="white", markeredgewidth=1,
                    zorder=5)

        ax.set_xlim(-grid_lim, grid_lim)
        ax.set_ylim(-grid_lim, grid_lim)
        ax.set_xlabel("x1", fontsize=12)
        ax.set_ylabel("x2", fontsize=12)
        ax.set_title(title if suffix == "true" else f"{title} (Voronoi est.)",
                     fontsize=14)
        ax.grid(True, alpha=0.3)
        ax.set_aspect("equal")

    fig.tight_layout()
    comp_path = system_dir / "phase_portrait_comparison.png"
    fig.savefig(comp_path, dpi=150)
    plt.close(fig)
    files["phase_portrait_comparison"] = str(comp_path)

    # Basin-assignment grid: roll a 15x15 IC grid under both dynamics,
    # color each IC by the attractor its endpoint lands nearest (the
    # quantitative view the Voronoi panels approximate geometrically).
    grid = np.linspace(-2.5, 2.5, 15)
    xx, yy = np.meshgrid(grid, grid)
    bx0 = jnp.asarray(
        np.stack([xx.ravel(), yy.ravel()], axis=-1), dtype=jnp.float32
    )
    true_traj = np.asarray(system.trajectory(bx0, 2000))
    pred_traj = np.asarray(rollout(model, params, bx0, 2000, 1))
    true_attr = _estimate_attractors(true_traj)
    tree = cKDTree(true_attr) if len(true_attr) else None

    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    for ax, traj, title in [
        (axes[0], true_traj, "true dynamics"),
        (axes[1], pred_traj, "learned dynamics"),
    ]:
        finals = traj[-1]
        ok = np.all(np.isfinite(finals), axis=-1)
        if tree is not None and ok.any():
            _, assign = tree.query(np.clip(finals[ok], -10, 10))
        else:
            assign = np.zeros(int(ok.sum()), dtype=int)
        ax.scatter(np.asarray(bx0)[ok, 0], np.asarray(bx0)[ok, 1],
                   c=assign, s=18, cmap="tab20", marker="s")
        if len(true_attr):
            ax.scatter(true_attr[:, 0], true_attr[:, 1], c="k", s=30, marker="x")
        ax.set_title(f"basins: {title}")
    fig.tight_layout()
    basin_path = system_dir / "basin_assignment.png"
    fig.savefig(basin_path, dpi=150)
    plt.close(fig)
    files["basin_assignment"] = str(basin_path)

    # Vector-magnitude histogram over trajectories (kept from round 1).
    fig, ax = plt.subplots(figsize=(6, 4))
    tm = np.linalg.norm(true_traj.reshape(-1, 2), axis=-1)
    pm = np.linalg.norm(pred_traj.reshape(-1, 2), axis=-1)
    pm = pm[np.isfinite(pm)]
    ax.hist(tm, bins=50, alpha=0.5, label="true", density=True)
    if len(pm):
        ax.hist(pm, bins=50, alpha=0.5, label="learned", density=True)
    ax.set_xlabel("|x|")
    ax.legend()
    fig.tight_layout()
    hist_path = system_dir / "magnitude_histogram.png"
    fig.savefig(hist_path, dpi=150)
    plt.close(fig)
    files["magnitude_histogram"] = str(hist_path)
    return files

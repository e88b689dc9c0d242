"""Pytree checkpointing.

Replaces the reference's ``torch.save`` dict checkpoints
(reference: train.py:475-492, 900-916) with a directory layout:

    <dir>/arrays.npz   — every array leaf, keyed by its pytree path
    <dir>/meta.json    — step/epoch/config/metrics/metadata + tree spec

Arrays are gathered to host before writing (works for sharded arrays:
``jax.device_get`` assembles the full value from its shards), and loads
restore plain numpy leaves the caller may re-shard. The format is
dependency-free and deterministic; Orbax remains usable on top for
multi-host async snapshots, but the framework's own tooling only needs
this.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


_SEP = "//"


def _flatten_with_paths(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_token(p) for p in path)
        flat[key] = np.asarray(jax.device_get(leaf))
    return flat


def _path_token(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return f"[{entry.idx}]"
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def save_checkpoint(
    directory: str | Path,
    state: Dict[str, Any],
    step: int,
    config_dict: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> Path:
    """Save a pytree ``state`` plus metadata. Returns the directory."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)

    flat = _flatten_with_paths(state)
    np.savez(directory / "arrays.npz", **flat)

    treedef = jax.tree_util.tree_structure(state)
    meta = {
        "step": int(step),
        "config": config_dict,
        "extra": extra or {},
        "treedef": str(treedef),
    }
    with open(directory / "meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return directory


def load_checkpoint(directory: str | Path, like: Dict[str, Any]) -> tuple[Dict[str, Any], dict]:
    """Load arrays into the structure of ``like``. Returns (state, meta)."""
    directory = Path(directory)
    with np.load(directory / "arrays.npz") as npz:
        flat_loaded = {k: npz[k] for k in npz.files}
    with open(directory / "meta.json") as f:
        meta = json.load(f)

    paths_like = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, leaf in paths_like[0]:
        key = _SEP.join(_path_token(p) for p in path)
        if key not in flat_loaded:
            raise KeyError(f"Checkpoint missing leaf '{key}'")
        loaded = flat_loaded[key]
        if hasattr(leaf, "shape") and tuple(loaded.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"Shape mismatch for '{key}': checkpoint {loaded.shape} vs model {np.shape(leaf)}"
            )
        leaves.append(loaded)
    state = jax.tree_util.tree_unflatten(paths_like[1], leaves)
    return state, meta


# ---------------------------------------------------------------------------
# Optional Orbax backend (multi-host / async production checkpointing)
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(
    directory: str | Path,
    state: Dict[str, Any],
    step: int,
    config_dict: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> Path:
    """Sharded Orbax checkpoint (SURVEY.md §5: the production-grade
    multi-host path — each host writes only its shards, unlike the npz
    backend which gathers the full value everywhere).

    Directory layout: <dir>/state (orbax) + <dir>/meta.json.
    """
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory / "state", state, force=True)
    meta = {"step": int(step), "config": config_dict, "extra": extra or {}}
    with open(directory / "meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return directory


def load_checkpoint_orbax(
    directory: str | Path, like: Dict[str, Any]
) -> tuple[Dict[str, Any], dict]:
    """Restore an Orbax checkpoint into the structure (and shardings) of
    ``like``."""
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(directory / "state", like)
    with open(directory / "meta.json") as f:
        meta = json.load(f)
    return state, meta


def load_params_any(path, cfg, model, seed: int = 0, allow_pickle: bool = False):
    """Load model params from EITHER this framework's npz checkpoint dir
    or a reference torch ``.pt`` file. Returns ``(params, step, ckpt)``
    where ``ckpt`` is the full loaded payload (meta dict for npz,
    load_torch_checkpoint dict for .pt). One dispatch point shared by
    the run_experiment and evaluate_checkpoints CLIs so the two formats
    cannot drift apart. ``allow_pickle`` opts in to full unpickling of
    .pt files that fail the safe weights_only load (runs embedded code —
    trusted checkpoints only).
    """
    import jax

    path = Path(path)
    if path.is_dir() and (path / "arrays.npz").exists():
        from kmpc_tpu.train.loop import init_train_state

        state = init_train_state(cfg, model, jax.random.PRNGKey(seed))
        state, meta = load_checkpoint(path, state)
        return state["params"], int(meta.get("step", -1)), meta
    if path.suffix == ".pt" and path.exists():
        from kmpc_tpu.utils.torch_import import load_torch_checkpoint

        ckpt = load_torch_checkpoint(str(path), allow_pickle=allow_pickle)
        step = ckpt.get("step")
        return ckpt["params"], int(step) if step is not None else -1, ckpt
    raise FileNotFoundError(f"no checkpoint at {path} (.pt or arrays.npz dir)")

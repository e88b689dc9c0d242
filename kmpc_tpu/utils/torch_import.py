"""Import reference (PyTorch) checkpoints into kmpc_tpu param pytrees.

The reference saves ``torch.save`` dicts with keys ``step``, ``epoch``
(finance), ``model_state_dict``, ``optimizer_state_dict``, ``config``,
``metrics``, ``finance_metadata`` (reference: train.py:475-492,
900-916). This module converts those checkpoints so a reference user
can load trained models directly into this framework:

    from kmpc_tpu.utils.torch_import import load_torch_checkpoint
    ckpt = load_torch_checkpoint("runs/.../checkpoint.pt")
    model, params = ckpt["model"], ckpt["params"]

Layout conventions mapped (verified by tests/test_torch_import.py
against hand-built torch forwards):

- ``nn.Linear.weight`` is [out, in] applied as x @ W^T (reference:
  model.py:98-106); our MLP stores 'w' as [in, out] applied as x @ w ->
  transpose. Biases copy verbatim.
- ``MLPCoder.network`` is an ``nn.Sequential`` with activation modules
  interleaved, so Linear entries sit at indices 0, 2, 4, ... (reference:
  model.py:92-103); parameter-free activations never appear in the
  state dict.
- ``kmat`` right-multiplies (``y @ kmat``, reference: model.py:311-321)
  in both frameworks -> verbatim copy.
- LISTA ``We.weight`` is [zdim, xdim] (reference: model.py:173-177); our
  'We' is [xdim, zdim] applied as x @ We -> transpose. ``S`` [z, z]
  right-multiplies in both (reference: model.py:206) -> verbatim. The
  non-linear-encoder variant stores an MLPCoder under ``We.network``.
- LISTAKM ``dict`` is stored [zdim, xdim] for ``y @ Wd`` in both
  (reference: model.py:818-820) -> verbatim. The ``dict_init`` buffer is
  initialization state, not a parameter -> dropped.

Optimizer state IS converted: the reference resume contract restores
AdamW moments along with the params (reference: train.py:378-384,
825-830; optimizer groups: train.py:158-188 — 'other' params at
TRAIN.LR with weight decay, 'kmat' at TRAIN.K_MATRIX_LR without).
``convert_optimizer_state`` maps each torch param's exp_avg/exp_avg_sq
onto the optax AdamW state tree (same per-parameter layout transposes
as the params themselves), and ``resume_train_state_from_torch`` builds
a ready train-state so ``train.py --checkpoint ref_run/checkpoint.pt``
continues a reference run with moments intact.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _collect_mlp(state_dict: Dict, prefix: str):
    """Rebuild an MLPCoder param list from ``{prefix}.{idx}.weight/bias``
    keys (reference: model.py:92-106). Returns a list of layer dicts in
    network order, matching kmpc_tpu.models.mlp.mlp_init's structure."""
    indices = sorted(
        {
            int(k[len(prefix) + 1 :].split(".")[0])
            for k in state_dict
            if k.startswith(prefix + ".")
        }
    )
    layers = []
    for idx in indices:
        w = state_dict[f"{prefix}.{idx}.weight"]
        layer = {"w": _to_np(w).T}  # torch [out,in] -> ours [in,out]
        bkey = f"{prefix}.{idx}.bias"
        if bkey in state_dict:
            layer["b"] = _to_np(state_dict[bkey])
        layers.append(layer)
    if not layers:
        raise KeyError(f"no '{prefix}.*.weight' entries in state dict")
    return layers


def convert_state_dict(state_dict: Dict, model_name: str) -> Dict:
    """Reference ``model_state_dict`` -> kmpc_tpu param pytree (numpy
    leaves; pass through ``jax.device_put`` or straight into apply fns).

    ``model_name`` is the registry name ('GenericKM', 'SparseKM',
    'LISTAKM') — the same value as ``cfg.MODEL.MODEL_NAME``.
    """
    sd = dict(state_dict)
    if model_name in ("GenericKM", "SparseKM"):
        return {
            "encoder": _collect_mlp(sd, "encoder.network"),
            "decoder": _collect_mlp(sd, "decoder.network"),
            "kmat": _to_np(sd["kmat"]),
        }
    if model_name == "LISTAKM":
        lista: Dict = {"S": _to_np(sd["lista.S"])}
        if "lista.We.weight" in sd:  # canonical linear encoder
            lista["We"] = _to_np(sd["lista.We.weight"]).T
        else:  # MLP pre-activation variant (reference: model.py:178-186)
            lista["We_mlp"] = _collect_mlp(sd, "lista.We.network")
        return {
            "dict": _to_np(sd["dict"]),
            "lista": lista,
            "kmat": _to_np(sd["kmat"]),
        }
    raise ValueError(f"Unknown model '{model_name}'")


# state_dict keys that are torch BUFFERS, not parameters (they appear in
# model_state_dict but never in named_parameters / optimizer state).
_BUFFER_KEYS = ("dict_init",)


def _optimizer_index_to_name(optimizer_state_dict: Dict, model_state_dict: Dict):
    """Map torch optimizer param indices -> state-dict parameter names.

    torch's ``optimizer.state_dict()`` keys per-param state by a global
    index assigned in param-group order; the reference's build_optimizer
    creates [other_params..., kmat_params...] with each group in
    ``named_parameters`` order (reference: train.py:158-188), which is
    the model_state_dict key order minus buffers.
    """
    names = [k for k in model_state_dict if k not in _BUFFER_KEYS]
    other = [n for n in names if "kmat" not in n]
    kmat = [n for n in names if "kmat" in n]
    groups = optimizer_state_dict["param_groups"]
    if len(groups) == 2:
        ordered_groups = [other, kmat]
    elif len(groups) == 1:
        ordered_groups = [other + kmat]
    else:
        raise ValueError(
            f"expected 1 or 2 AdamW param groups (reference layout), got "
            f"{len(groups)}"
        )
    mapping = {}
    for group, group_names in zip(groups, ordered_groups):
        idxs = list(group["params"])
        if len(idxs) != len(group_names):
            raise ValueError(
                f"optimizer group has {len(idxs)} params but the model "
                f"state dict implies {len(group_names)} "
                f"({group_names[:3]}...) — not a reference-layout checkpoint"
            )
        mapping.update(zip(idxs, group_names))
    return mapping


def convert_optimizer_state(
    optimizer_state_dict: Dict,
    model_state_dict: Dict,
    model_name: str,
    params: Dict,
    tx,
):
    """Reference torch-AdamW ``optimizer_state_dict`` -> optax opt_state.

    ``tx`` is the optax transformation from ``train.loop.build_optimizer``
    (multi_transform over {'other','kmat'} AdamW groups — the same
    partition as the reference, train.py:158-188). Per-parameter
    ``exp_avg``/``exp_avg_sq`` moments are converted with the SAME layout
    mapping as the parameters themselves (convert_state_dict — moments
    are elementwise per-parameter, so the Linear [out,in]->[in,out]
    transposes apply identically) and grafted into ``tx.init(params)``'s
    ScaleByAdamState leaves; the bias-correction count is the torch
    per-param step (identical across params after normal training).
    Parameters with no recorded state keep zero moments (torch populates
    state lazily on first update — same semantics).
    """
    import jax
    import jax.numpy as jnp
    import optax

    mapping = _optimizer_index_to_name(optimizer_state_dict, model_state_dict)
    state = optimizer_state_dict.get("state", {})

    exp_avg_sd: Dict = {}
    exp_avg_sq_sd: Dict = {}
    steps = []
    for idx, name in mapping.items():
        s = state.get(idx, state.get(str(idx)))
        if s is None:  # never updated: zero moments (optax init default)
            exp_avg_sd[name] = model_state_dict[name] * 0
            exp_avg_sq_sd[name] = model_state_dict[name] * 0
            continue
        exp_avg_sd[name] = s["exp_avg"]
        exp_avg_sq_sd[name] = s["exp_avg_sq"]
        steps.append(int(s["step"]))

    opt_state = tx.init(params)
    if not steps:
        return opt_state
    count = max(steps)
    mu_full = convert_state_dict(exp_avg_sd, model_name)
    nu_full = convert_state_dict(exp_avg_sq_sd, model_name)

    def graft(masked_tree, full_tree):
        # multi_transform masks each group's state: masked-out leaves are
        # optax.MaskedNode sentinels; real leaves take the torch moments.
        return jax.tree.map(
            lambda m, f: m if isinstance(m, optax.MaskedNode)
            else jnp.asarray(f),
            masked_tree, full_tree,
            is_leaf=lambda x: isinstance(x, optax.MaskedNode),
        )

    def fix(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=jnp.asarray(count, node.count.dtype),
                mu=graft(node.mu, mu_full),
                nu=graft(node.nu, nu_full),
            )
        return node

    return jax.tree.map(
        fix, opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
    )


def resume_train_state_from_torch(
    path: str,
    cfg,
    state: Dict,
    allow_pickle: bool = False,
) -> Dict:
    """Build a full kmpc_tpu train state (params + AdamW moments + step)
    from a reference ``checkpoint.pt`` — the reference resume contract
    (reference: train.py:378-384: model AND optimizer state restored).

    ``state`` is the freshly initialized train state whose structure the
    loaded checkpoint must match (same shape-compatibility contract as
    utils/checkpoint.load_checkpoint).
    """
    import jax

    ckpt = load_torch_checkpoint(path, allow_pickle=allow_pickle)
    params = ckpt["params"]

    def check(a, b):
        if tuple(jax.numpy.shape(a)) != tuple(jax.numpy.shape(b)):
            raise ValueError(
                f"checkpoint param shape {jax.numpy.shape(b)} does not "
                f"match the configured model {jax.numpy.shape(a)}"
            )
        return b

    params = jax.tree.map(check, state["params"], params)

    from kmpc_tpu.train.loop import build_optimizer

    tx = build_optimizer(cfg, params)
    osd = ckpt.get("optimizer_state_dict")
    if osd is not None:
        opt_state = convert_optimizer_state(
            osd, ckpt["model_state_dict"], cfg.MODEL.MODEL_NAME, params, tx
        )
    else:
        opt_state = tx.init(params)
    step = int(ckpt.get("step") or 0)
    return {
        "params": params,
        "opt_state": opt_state,
        "step": jax.numpy.asarray(step, jax.numpy.int32),
    }


def load_torch_checkpoint(
    path: str,
    observation_size: Optional[int] = None,
    allow_pickle: bool = False,
) -> Dict:
    """Load a reference checkpoint.pt and return a dict with:

    - ``config``: kmpc_tpu Config rebuilt from the saved config dict
      (unknown reference-only fields are ignored; kmpc_tpu-only sections
      keep their defaults)
    - ``model``: kmpc_tpu model built via make_model
    - ``params``: converted param pytree (jax arrays)
    - ``step`` / ``epoch`` / ``metrics`` / ``finance_metadata``: verbatim

    ``observation_size`` is inferred from the encoder input dimension
    when not given.

    Checkpoints are loaded with ``torch.load(weights_only=True)``, which
    rejects files embedding arbitrary python objects (older reference
    runs pickled whole config objects). A full unpickle EXECUTES code
    from the file, so it never happens implicitly: pass
    ``allow_pickle=True`` only for checkpoints you trust.
    """
    import pickle
    import warnings

    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except (pickle.UnpicklingError, RuntimeError) as e:
        if not allow_pickle:
            raise RuntimeError(
                f"{path} is not loadable with weights_only=True ({e}). "
                "Loading it requires a full unpickle, which runs code "
                "embedded in the file. If you trust this checkpoint, "
                "pass allow_pickle=True (CLI: --allow_pickle)."
            ) from e
        warnings.warn(
            f"{path} is not loadable with weights_only=True ({e}); "
            "retrying with weights_only=False (allow_pickle=True), which "
            "runs pickled code from the file.",
            stacklevel=2,
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)

    from kmpc_tpu.config import Config
    from kmpc_tpu.models import make_model

    cfg_dict = ckpt.get("config")
    if cfg_dict is None:
        raise KeyError(f"{path} has no 'config' entry")
    cfg = Config.from_dict(cfg_dict)

    sd = ckpt["model_state_dict"]
    if observation_size is None:
        observation_size = _infer_observation_size(sd, cfg.MODEL.MODEL_NAME)

    model = make_model(cfg, observation_size)
    params_np = convert_state_dict(sd, cfg.MODEL.MODEL_NAME)

    import jax

    params = jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), params_np)
    return {
        "config": cfg,
        "model": model,
        "params": params,
        "step": ckpt.get("step"),
        "epoch": ckpt.get("epoch"),
        "metrics": ckpt.get("metrics"),
        "finance_metadata": ckpt.get("finance_metadata"),
        # Raw state dicts for the optimizer-resume path
        # (convert_optimizer_state / resume_train_state_from_torch).
        "model_state_dict": sd,
        "optimizer_state_dict": ckpt.get("optimizer_state_dict"),
    }


def _infer_observation_size(state_dict: Dict, model_name: str) -> int:
    if model_name == "LISTAKM":
        if "lista.We.weight" in state_dict:
            return int(state_dict["lista.We.weight"].shape[1])
        return int(state_dict["dict"].shape[1])
    first = min(
        (
            k
            for k in state_dict
            if k.startswith("encoder.network.") and k.endswith(".weight")
        ),
        key=lambda k: int(k.split(".")[2]),
    )
    return int(state_dict[first].shape[1])


def export_params_to_state_dict(
    params: Dict, model_name: str
) -> Dict[str, "np.ndarray"]:
    """Inverse conversion: kmpc_tpu params -> reference-layout state dict
    (numpy values; wrap with torch.as_tensor to feed a torch module).
    Useful for cross-validating models in the reference's tooling."""
    out: Dict[str, np.ndarray] = {}

    def emit_mlp(prefix: str, layers) -> None:
        # Reference Sequential interleaves activations after every hidden
        # Linear, so Linear i sits at index 2*i (reference: model.py:92-103).
        for i, layer in enumerate(layers):
            out[f"{prefix}.{2 * i}.weight"] = np.asarray(layer["w"]).T
            if "b" in layer:
                out[f"{prefix}.{2 * i}.bias"] = np.asarray(layer["b"])

    if model_name in ("GenericKM", "SparseKM"):
        emit_mlp("encoder.network", params["encoder"])
        emit_mlp("decoder.network", params["decoder"])
        out["kmat"] = np.asarray(params["kmat"])
        return out
    if model_name == "LISTAKM":
        out["dict"] = np.asarray(params["dict"])
        out["kmat"] = np.asarray(params["kmat"])
        out["lista.S"] = np.asarray(params["lista"]["S"])
        if "We" in params["lista"]:
            out["lista.We.weight"] = np.asarray(params["lista"]["We"]).T
        else:
            emit_mlp("lista.We.network", params["lista"]["We_mlp"])
        return out
    raise ValueError(f"Unknown model '{model_name}'")


def check_finance_compatibility(fd, ckpt: Dict) -> None:
    """Guard the torch-checkpoint drop-in path against silently evaluating
    a reference-trained model on a mismatched data panel.

    Raises ValueError when the loaded FinanceData disagrees with the
    checkpoint's ``finance_metadata`` on asset count / embedding dim /
    observation size (reference metadata contract:
    data_finance.py:484-497). Warns when the panel is synthetic: this
    environment has no network access, so unless
    ``cfg.ENV.FINANCE.CACHE_DIR`` points at the original parquet cache,
    the standardization stats will not match the checkpoint's training
    data and backtest metrics are not meaningful.
    """
    import warnings

    meta = ckpt.get("finance_metadata") or {}
    checks = {
        "n_assets": fd.n_assets,
        "embedding_dim": fd.metadata.get("embedding_dim"),
        "observation_size": fd.observation_size,
    }
    for key, ours in checks.items():
        theirs = meta.get(key)
        if theirs is not None and ours is not None and int(theirs) != int(ours):
            raise ValueError(
                f"checkpoint finance_metadata[{key!r}] = {theirs} does not "
                f"match the loaded data panel ({ours}); point "
                "ENV.FINANCE.CACHE_DIR at the checkpoint's original data "
                "or fix the config"
            )
    cfg = ckpt.get("config")
    synthetic = getattr(
        getattr(getattr(cfg, "ENV", None), "FINANCE", None), "SYNTHETIC", None
    )
    if synthetic:
        warnings.warn(
            "Evaluating a reference-trained checkpoint on the SYNTHETIC "
            "finance panel: its standardization stats differ from the "
            "data the model was trained on, so metrics exercise the "
            "machinery but are not meaningful. Set "
            "ENV.FINANCE.CACHE_DIR to the original parquet cache for "
            "real comparisons.",
            stacklevel=2,
        )

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

Optimizer state is NOT converted: the reference uses torch AdamW whose
moment layout mirrors torch parameter shapes; resuming training here
re-warms optax state from the imported params instead.
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

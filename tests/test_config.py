"""Config system tests (mirrors reference tests/test_config.py coverage:
structure, presets, registry, mutation, JSON round-trip)."""

import json

import pytest

from kmpc_tpu.config import (
    Config,
    get_config,
    _TRAIN_CONFIG_REGISTRY,
)


def test_default_config_structure():
    cfg = Config()
    assert cfg.SEED == 0
    assert cfg.ENV.ENV_NAME == "duffing"
    assert cfg.MODEL.MODEL_NAME == "SparseKM"
    assert cfg.MODEL.TARGET_SIZE == 16
    assert cfg.TRAIN.BATCH_SIZE == 256
    assert cfg.MPC.HORIZON == 5
    assert cfg.BACKTEST.INITIAL_CAPITAL == 10_000.0
    assert cfg.PARALLEL.DATA == 1


def test_registry_contains_all_presets():
    expected = {
        "generic",
        "generic_sparse",
        "generic_prediction",
        "lista",
        "lista_nonlinear",
        "finance_sparse",
    }
    assert expected == set(_TRAIN_CONFIG_REGISTRY.keys())


@pytest.mark.parametrize("name", sorted(_TRAIN_CONFIG_REGISTRY.keys()) + ["default"])
def test_get_config_all_presets(name):
    cfg = get_config(name)
    assert isinstance(cfg, Config)


def test_get_config_unknown_raises():
    with pytest.raises(ValueError):
        get_config("nonexistent")


def test_generic_preset_values():
    cfg = get_config("generic")
    assert cfg.MODEL.MODEL_NAME == "GenericKM"
    assert cfg.MODEL.TARGET_SIZE == 64
    assert cfg.MODEL.ENCODER.LAYERS == [64, 64]
    assert cfg.MODEL.SPARSITY_COEFF == 0.0


def test_lista_preset_values():
    cfg = get_config("lista")
    assert cfg.MODEL.MODEL_NAME == "LISTAKM"
    assert cfg.MODEL.ENCODER.LISTA.LINEAR_ENCODER is True
    assert cfg.MODEL.TARGET_SIZE == 2048
    # Reference preset sets ALPHA to 5e-3 (reference: config.py:409).
    assert cfg.MODEL.ENCODER.LISTA.ALPHA == 5e-3
    assert cfg.MODEL.ENCODER.LISTA.L == 0.1


def test_finance_sparse_preset_values():
    cfg = get_config("finance_sparse")
    assert cfg.ENV.ENV_NAME == "finance"
    assert cfg.MODEL.TARGET_SIZE == 1024
    assert cfg.TRAIN.USE_SEQUENCE_LOSS is True
    assert cfg.TRAIN.SEQUENCE_LENGTH == 10
    assert cfg.TRAIN.K_MATRIX_LR == 1e-4
    assert len(cfg.ENV.FINANCE.TICKERS) == 20


def test_config_mutation():
    cfg = get_config("generic")
    cfg.MODEL.TARGET_SIZE = 128
    cfg.TRAIN.BATCH_SIZE = 512
    cfg.ENV.ENV_NAME = "pendulum"
    assert cfg.MODEL.TARGET_SIZE == 128
    assert cfg.TRAIN.BATCH_SIZE == 512
    assert cfg.ENV.ENV_NAME == "pendulum"


def test_json_round_trip(tmp_path):
    cfg = get_config("finance_sparse")
    cfg.SEED = 77
    cfg.MODEL.ENCODER.LISTA.NUM_LOOPS = 3
    cfg.MPC.SOLVER.MAX_ITERS = 123
    path = tmp_path / "config.json"
    cfg.to_json(str(path))

    loaded = Config.from_json(str(path))
    assert loaded.SEED == 77
    assert loaded.MODEL.ENCODER.LISTA.NUM_LOOPS == 3
    assert loaded.MPC.SOLVER.MAX_ITERS == 123
    assert loaded.to_dict() == cfg.to_dict()


def test_from_dict_ignores_unknown_keys():
    d = get_config("generic").to_dict()
    d["BOGUS"] = 42
    d["MODEL"]["ALSO_BOGUS"] = "x"
    # Unknown keys in nested dataclass dicts would raise in a strict ctor;
    # the generic reconstruction ignores them.
    cfg = Config.from_dict(d)
    assert cfg.MODEL.MODEL_NAME == "GenericKM"


def test_to_dict_is_json_serializable():
    for name in _TRAIN_CONFIG_REGISTRY:
        json.dumps(get_config(name).to_dict())

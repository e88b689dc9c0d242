"""Model layer: MLP/LISTA coders and Koopman machines."""

from kmpc_tpu.models.mlp import get_activation, mlp_apply, mlp_init
from kmpc_tpu.models.lista import lista_apply, lista_init, shrink
from kmpc_tpu.models.koopman import KoopmanModel, make_model, spectral_metrics

__all__ = [
    "get_activation",
    "mlp_apply",
    "mlp_init",
    "lista_apply",
    "lista_init",
    "shrink",
    "KoopmanModel",
    "make_model",
    "spectral_metrics",
]

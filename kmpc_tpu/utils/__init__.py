"""Utilities: metrics logging and pytree checkpointing."""

from kmpc_tpu.utils.logger import MetricsLogger
from kmpc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["MetricsLogger", "load_checkpoint", "save_checkpoint"]

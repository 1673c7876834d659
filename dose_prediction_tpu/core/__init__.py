"""Core runtime: checkpointing/weight surgery, framework flags."""

from dose_prediction_tpu.core.checkpoint import (
    CheckpointManager,
    load_pretrained_net_a,
    merge_partial,
    restore_checkpoint,
    save_checkpoint,
    strip_prefix,
)
from dose_prediction_tpu.core.config import FLAGS, Flags, on_tpu

__all__ = [
    "CheckpointManager",
    "FLAGS",
    "Flags",
    "load_pretrained_net_a",
    "merge_partial",
    "on_tpu",
    "restore_checkpoint",
    "save_checkpoint",
    "strip_prefix",
]

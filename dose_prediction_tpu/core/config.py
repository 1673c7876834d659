"""Global framework configuration flags.

Replaces the reference's module-constant config files (SURVEY.md §5.6) for
framework-level switches; per-run hyperparameters live in
train.trainers.TrainConfig.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Flags:
    # Use the Pallas fused attention kernel inside the ViT (TPU only; the
    # XLA einsum path is used off-TPU or when False).
    use_pallas_attention: bool = os.environ.get("DPT_PALLAS_ATTENTION", "1") == "1"
    # Use the Pallas fused InstanceNorm+act kernel (TPU only).
    use_pallas_instance_norm: bool = os.environ.get("DPT_PALLAS_IN", "0") == "1"
    # Default compute dtype name for models ('bfloat16' on TPU, 'float32' off).
    compute_dtype: str = os.environ.get("DPT_COMPUTE_DTYPE", "bfloat16")


FLAGS = Flags()


def on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

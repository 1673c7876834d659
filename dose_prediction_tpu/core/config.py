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
    # Pallas fused InstanceNorm kernel policy: 'auto' picks it on TPU when
    # the channel count fills the 128-lane registers (measured: slower than
    # XLA at C=16 from lane padding, faster at C≥256 — docs/PERFORMANCE.md);
    # '1' forces it on TPU at every width, '0' disables.
    use_pallas_instance_norm: str = os.environ.get("DPT_PALLAS_IN", "auto")

    def pallas_instance_norm_for(self, channels: int, n_spatial: int = 0) -> bool:
        """auto: the fused kernel wins only where IN is HBM-bound — wide
        channels (128-lane registers filled) AND a volume big enough that the
        2-read-1-write schedule matters (≥2^18 voxels ≈ 64³)."""
        if self.use_pallas_instance_norm == "1":
            return on_tpu()
        if self.use_pallas_instance_norm == "auto":
            return channels >= 128 and n_spatial >= (1 << 18) and on_tpu()
        return False
    # Route same-size k3 convs (C==Cout ∈ {16,32,64}, stride/dil 1) through
    # the Pallas direct kernel (kernels/conv3d.py): '0' off (default — the
    # decomposed XLA path measured at/above it in-model, docs/PERFORMANCE.md
    # round-4 study), '1' = 256-lane band, 'tight' = (F+2)·C band.
    use_pallas_conv3d: str = os.environ.get("DPT_PALLAS_CONV", "0")
    # Default compute dtype name for models ('bfloat16' on TPU, 'float32' off).
    compute_dtype: str = os.environ.get("DPT_COMPUTE_DTYPE", "bfloat16")


FLAGS = Flags()


def on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

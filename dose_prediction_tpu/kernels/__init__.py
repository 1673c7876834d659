"""Pallas TPU kernels (fused attention, fused InstanceNorm+act) with custom
VJPs and XLA fallbacks off-TPU."""

from dose_prediction_tpu.kernels.attention import fused_attention, xla_attention
from dose_prediction_tpu.kernels.instance_norm import instance_norm_act

__all__ = ["fused_attention", "instance_norm_act", "xla_attention"]

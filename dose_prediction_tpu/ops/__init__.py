"""TPU-first 3D primitives (NDHWC, channels-last)."""

from dose_prediction_tpu.ops.act import (
    gelu,
    get_act,
    leaky_relu,
    mish,
    prelu,
    relu,
    sigmoid,
    softplus,
    tanh,
)
from dose_prediction_tpu.ops.conv import (
    avg_pool3d,
    conv3d,
    conv_transpose3d,
    max_pool3d,
)
from dose_prediction_tpu.ops.norm import (
    batch_norm,
    group_norm,
    instance_norm,
    layer_norm,
)
from dose_prediction_tpu.ops.resize import (
    downsample_pyramid,
    resize3d,
    upsample3d,
)

__all__ = [
    "avg_pool3d",
    "batch_norm",
    "conv3d",
    "conv_transpose3d",
    "downsample_pyramid",
    "gelu",
    "get_act",
    "group_norm",
    "instance_norm",
    "layer_norm",
    "leaky_relu",
    "max_pool3d",
    "mish",
    "prelu",
    "relu",
    "resize3d",
    "sigmoid",
    "softplus",
    "tanh",
    "upsample3d",
]

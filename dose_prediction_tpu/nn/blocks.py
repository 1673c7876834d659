"""C3D U-Net building blocks (reference DosePrediction/Models/Networks/c3d.py).

SingleConv = Conv3d(bias) + InstanceNorm(affine) + ReLU (c3d.py:11-22);
UpConv = trilinear ×2 (align_corners=True) + SingleConv (c3d.py:25-38).
Weights use kaiming_uniform(relu) per BaseUNet.initialize (c3d.py:127-142).
"""

from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from dose_prediction_tpu import ops
from dose_prediction_tpu.nn import init as tinit
from dose_prediction_tpu.nn.layers import Conv3D, InstanceNorm


class SingleConv(fnn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        x = Conv3D(
            self.features,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            kernel_init=tinit.kaiming_uniform_relu(),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = InstanceNorm(affine=True, name="norm")(x)
        return ops.relu(x)


class UpConv(fnn.Module):
    features: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        x = ops.upsample3d(x, 2, mode="trilinear", align_corners=True)
        return SingleConv(self.features, 3, 1, 1, dtype=self.dtype, name="conv")(x)

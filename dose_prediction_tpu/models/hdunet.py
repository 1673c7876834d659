"""HD-UNet — DenseNet-style U-Net dose baseline.

Parity target: DosePrediction/Models/Networks/hdunet.py — DenseConvolve
(conv+IN+ReLU concat growth, :20), DenseDownsample (stride-2 conv ‖ maxpool
concat, :34), trilinear UNetUpsample (:50), fixed decoder widths
256/128/64/32 with a 1×1 head (:106-152). Default config in the trainer:
in_ch=9, growth_rate=16, upsample_chan=64 (train_light_hdunet.py:69).
"""

from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax
import jax.numpy as jnp

from dose_prediction_tpu import ops
from dose_prediction_tpu.nn import init as tinit
from dose_prediction_tpu.nn.blocks import SingleConv
from dose_prediction_tpu.nn.layers import Conv3D


class DenseConvolve(fnn.Module):
    growth_rate: int = 16
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        h = SingleConv(self.growth_rate, 3, 1, 1, dtype=self.dtype, name="conv")(x)
        return jnp.concatenate([h, x], axis=-1)


class DenseDownsample(fnn.Module):
    growth_rate: int = 16
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        h = SingleConv(self.growth_rate, 3, 2, 1, dtype=self.dtype, name="conv")(x)
        pooled = ops.max_pool3d(x, 2)
        return jnp.concatenate([h, pooled], axis=-1)


class UNetUpsample(fnn.Module):
    features: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        x = ops.upsample3d(x, 2, mode="trilinear", align_corners=True)
        return SingleConv(self.features, 3, 1, 1, dtype=self.dtype, name="conv")(x)


class HDUNet(fnn.Module):
    growth_rate: int = 16
    upsample_chan: int = 64
    out_ch: int = 1
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x) -> jax.Array:
        g = self.growth_rate
        dc = lambda name: DenseConvolve(g, dtype=self.dtype, name=name)
        dd = lambda name: DenseDownsample(g, dtype=self.dtype, name=name)

        e1 = dc("enc1_c2")(dc("enc1_c1")(x))
        e2 = dc("enc2_c2")(dc("enc2_c1")(dd("enc2_down")(e1)))
        e3 = dc("enc3_c2")(dc("enc3_c1")(dd("enc3_down")(e2)))
        e4 = dc("enc4_c2")(dc("enc4_c1")(dd("enc4_down")(e3)))
        e5 = dd("enc5_down")(e4)
        for i in range(1, 5):
            e5 = dc(f"enc5_c{i}")(e5)

        def dec(level, up_in, skip, width):
            h = UNetUpsample(self.upsample_chan, dtype=self.dtype, name=f"upconv_{level}")(up_in)
            h = jnp.concatenate([h, skip], axis=-1)
            h = SingleConv(width, 3, 1, 1, dtype=self.dtype, name=f"dec{level}_c1")(h)
            return SingleConv(width, 3, 1, 1, dtype=self.dtype, name=f"dec{level}_c2")(h)

        d4 = dec(4, e5, e4, 256)
        d3 = dec(3, d4, e3, 128)
        d2 = dec(2, d3, e2, 64)
        d1 = dec(1, d2, e1, 32)
        return Conv3D(self.out_ch, 1, padding=0,
                      kernel_init=tinit.kaiming_uniform_relu(),
                      dtype=self.dtype, name="final_conv")(d1)

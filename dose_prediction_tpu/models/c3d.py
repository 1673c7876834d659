"""C3D cascade U-Net — the dose baseline and the cascade's net_A.

Parity target: DosePrediction/Models/Networks/c3d.py (BaseUNet :118, cascade
Model :152). 5-level plain 3D U-Net; stride-2 downsampling convs; trilinear
(align_corners) upsampling; Conv+InstanceNorm(affine)+ReLU everywhere;
kaiming_uniform(relu) init.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from dose_prediction_tpu.nn.blocks import SingleConv, UpConv
from dose_prediction_tpu.nn.layers import Conv3D

DEFAULT_LIST_CH = (-1, 32, 64, 128, 256, 512)


class Encoder(fnn.Module):
    list_ch: Sequence[int]
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        ch = self.list_ch
        outs = []
        for level in range(1, 6):
            stride = 1 if level == 1 else 2
            x = SingleConv(ch[level], 3, stride, 1, dtype=self.dtype, name=f"encoder_{level}_conv1")(x)
            x = SingleConv(ch[level], 3, 1, 1, dtype=self.dtype, name=f"encoder_{level}_conv2")(x)
            outs.append(x)
        return outs


class Decoder(fnn.Module):
    list_ch: Sequence[int]
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, enc_outs):
        ch = self.list_ch
        e1, e2, e3, e4, e5 = enc_outs
        x = e5
        for level, skip in ((4, e4), (3, e3), (2, e2)):
            x = UpConv(ch[level], dtype=self.dtype, name=f"upconv_{level}")(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = SingleConv(ch[level], 3, 1, 1, dtype=self.dtype, name=f"decoder_{level}_conv1")(x)
            x = SingleConv(ch[level], 3, 1, 1, dtype=self.dtype, name=f"decoder_{level}_conv2")(x)
        x = UpConv(ch[1], dtype=self.dtype, name="upconv_1")(x)
        x = jnp.concatenate([x, e1], axis=-1)
        x = SingleConv(ch[1], 3, 1, 1, dtype=self.dtype, name="decoder_1_conv1")(x)
        return x


class BaseUNet(fnn.Module):
    """Returns the ch[1]-channel feature map (the cascade feeds it onward)."""

    list_ch: Sequence[int] = DEFAULT_LIST_CH
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        enc = Encoder(self.list_ch, dtype=self.dtype, name="encoder")(x)
        return Decoder(self.list_ch, dtype=self.dtype, name="decoder")(enc)


class CascadeC3D(fnn.Module):
    """Two stacked BaseUNets (c3d.Model :152): net_B sees cat(net_A out, input).

    Returns [output_A, output_B], each out_ch channels.
    """

    out_ch: int = 1
    list_ch_A: Sequence[int] = DEFAULT_LIST_CH
    list_ch_B: Sequence[int] = DEFAULT_LIST_CH
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        out_a = BaseUNet(self.list_ch_A, dtype=self.dtype, name="net_A")(x)
        out_b = BaseUNet(self.list_ch_B, dtype=self.dtype, name="net_B")(
            jnp.concatenate([out_a, x], axis=-1)
        )
        pred_a = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="conv_out_A")(out_a)
        pred_b = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="conv_out_B")(out_b)
        return pred_a, pred_b

"""UNETR block family, re-implemented from MONAI 0.7 semantics (the vendored
dependency surface enumerated in SURVEY.md §2.8; usage sites
dose_pyfer.py:69-113 and oar_transeg.py:92-161).

MONAI conventions reproduced:
- get_conv_layer defaults: bias=False; transposed convs are k=up, s=up.
- UnetResBlock / UnetBasicBlock: InstanceNorm(affine=True) + LeakyReLU(0.01).
- UnetrPrUpBlock(conv_block, res_block): initial transp conv then num_layer ×
  (transp conv + res/basic block), applied sequentially.
- UnetrUpBlock: transp conv, concat skip on channels, UnetBasicBlock.

Modified variants (reference OARSegmentation/Models/Nets/base_blocks.py):
- ModifiedUnetrUpBlock (:91): transp conv + concat + Conv31/DualDilatedBlock.
- ModifiedUnetOutBlock (:144): 1×1 conv with bias.
"""

from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from dose_prediction_tpu import ops
from dose_prediction_tpu.nn.layers import Conv3D, ConvTranspose3D, make_norm
from dose_prediction_tpu.nn.mdunet import Conv31, DualDilatedBlock


class UnetResBlock(fnn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "instance"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        residual = x
        h = Conv3D(self.features, self.kernel_size, stride=self.stride, padding=pad,
                   use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = make_norm(self.norm)(h)
        h = ops.leaky_relu(h, 0.01)
        h = Conv3D(self.features, self.kernel_size, padding=pad,
                   use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = make_norm(self.norm)(h)
        downsample = (x.shape[-1] != self.features) or (self.stride != 1)
        if downsample:
            residual = Conv3D(self.features, 1, stride=self.stride, padding=0,
                              use_bias=False, dtype=self.dtype, name="conv3")(residual)
            residual = make_norm(self.norm)(residual)
        return ops.leaky_relu(h + residual, 0.01)


class UnetBasicBlock(fnn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "instance"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        h = Conv3D(self.features, self.kernel_size, stride=self.stride, padding=pad,
                   use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = make_norm(self.norm)(h)
        h = ops.leaky_relu(h, 0.01)
        h = Conv3D(self.features, self.kernel_size, padding=pad,
                   use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = make_norm(self.norm)(h)
        return ops.leaky_relu(h, 0.01)


class UnetrBasicBlock(fnn.Module):
    """skip1 / encoder1 block (dose_pyfer.py:69, oar_transeg.py:92)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "instance"
    res_block: bool = True
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        return cls(self.features, self.kernel_size, self.stride, self.norm,
                   dtype=self.dtype, name="layer")(x)


class UnetrPrUpBlock(fnn.Module):
    """Projection-upsample chain from ViT feature maps (dose_pyfer.py:78-113)."""

    features: int
    num_layer: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    norm: str = "instance"
    conv_block: bool = True
    res_block: bool = True
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        up = self.upsample_kernel_size
        x = ConvTranspose3D(self.features, up, stride=up, use_bias=False,
                            dtype=self.dtype, name="transp_conv_init")(x)
        for i in range(self.num_layer):
            x = ConvTranspose3D(self.features, up, stride=up, use_bias=False,
                                dtype=self.dtype, name=f"up{i}")(x)
            if self.conv_block:
                cls = UnetResBlock if self.res_block else UnetBasicBlock
                x = cls(self.features, self.kernel_size, 1, self.norm,
                        dtype=self.dtype, name=f"block{i}")(x)
        return x


class UnetrUpBlock(fnn.Module):
    """Plain UNETR decoder stage (dose_pyfer.py:164-230, mode_multi=False).

    ``res_block`` mirrors the MONAI knob: False (the MONAI default — every
    dose-side usage, dose_pyfer.py:164 / models_experiments.py:408,1189)
    uses UnetBasicBlock; True (the seg-task UNETR,
    train_light_transeg.py:104) uses UnetResBlock, whose concat input
    (2×features) triggers the conv3/norm3 downsample branch."""

    features: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    norm: str = "instance"
    res_block: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, skip):
        up = self.upsample_kernel_size
        x = ConvTranspose3D(self.features, up, stride=up, use_bias=False,
                            dtype=self.dtype, name="transp_conv")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        cls = UnetResBlock if self.res_block else UnetBasicBlock
        return cls(self.features, self.kernel_size, 1, self.norm,
                   dtype=self.dtype, name="conv_block")(x)


class ModifiedUnetrUpBlock(fnn.Module):
    """Multi-scale decoder stage (base_blocks.py:91-141): transp conv + concat
    skip + Conv31 (multiS_conv) or DualDilatedBlock.

    ``family`` selects the conv-block copy the reference variant imports:
    'seg' = Models/Nets (IN flavor, base_blocks.py:9), 'dose' = the
    BatchNorm/bare-fuse copy the OldModels TRANSEG decoder uses
    (OldModels/Nets/base_blocks.py:10 imports OldModels blocks_MDUNet, whose
    conv_3_1 is identical to the dose copy), 'ablation' =
    base_blocks_ablation.py:9."""

    features: int
    upsample_kernel_size: int = 2
    act: str = "relu"
    multiS_conv: bool = True
    family: str = "seg"
    # 'separable' swaps the Conv31 k7 branch for the 1-D-chain variant
    # (nn/mdunet.py ConvBlockK.separable); only meaningful with multiS_conv
    k7_mode: str = "dense"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, skip, train: bool = True):
        up = self.upsample_kernel_size
        x = ConvTranspose3D(self.features, up, stride=up, use_bias=False,
                            dtype=self.dtype, name="transp_conv")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        if self.multiS_conv:
            return Conv31(self.features, act=self.act, family=self.family,
                          k7_mode=self.k7_mode,
                          dtype=self.dtype, name="conv_block")(x, train)
        return DualDilatedBlock(self.features, act=self.act, family=self.family,
                                dtype=self.dtype, name="conv_block")(x, train)


class ModifiedUnetOutBlock(fnn.Module):
    """1×1×1 output head (base_blocks.py:144-165)."""

    features: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        return Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="conv")(x)

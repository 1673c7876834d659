"""Multi-scale / multi-kernel conv block family.

Parity targets (cited into the reference):
- conv_block_3 / dilated_conv_block_5 / dilated_conv_block_7 / conv_block_7:
  OARSegmentation/Models/Nets/blocks_MDUNet.py:64-129,160-192.
- conv_3_1 (k3‖k7 → 1×1 fuse): blocks_MDUNet.py:132-157. Note the reference
  quirks reproduced here: the k3 branch's *inner* activations are always ReLU
  (conv_block_3 is constructed without the act argument), and the k7 branch
  uses BatchNorm3d + ReLU inside (conv_block_7), while the three *outer*
  norm+act stages use affine-free InstanceNorm + the configured activation.
- DualDilatedBlock (k3 ‖ d2-k3 ‖ d3-k3 → 1×1): blocks_MDUNet.py:194-215.
- MultiScaleConv (k3‖k5‖k7 → 1×1, plain conv+ReLU, no norm):
  OARSegmentation/Models/Nets/convs.py:41-61.

TPU note: parallel branches reading the same input are emitted as independent
convs; XLA shares the input load from HBM and runs them back-to-back on the
MXU. A fused Pallas variant can replace this once profiled.
"""

from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from dose_prediction_tpu import ops
from dose_prediction_tpu.nn.layers import BatchNorm, Conv3D, InstanceNorm


class ConvBlockK(fnn.Module):
    """Two k×k×k convs, each followed by norm + act.

    norm: 'instance' (affine-free, torch default) or 'batch'.
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    norm: str = "instance"
    act: str = "relu"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        pad = self.dilation * (self.kernel_size - 1) // 2
        act = ops.get_act(self.act)
        for i in range(2):
            x = Conv3D(
                self.features,
                self.kernel_size,
                padding=pad,
                dilation=self.dilation,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if self.norm == "instance":
                x = InstanceNorm(affine=False, name=f"norm{i}")(x)
            else:
                x = BatchNorm(name=f"norm{i}")(x, use_running_average=not train)
            x = act(x)
        return x


class Conv31(fnn.Module):
    """conv_3_1: k3 branch ‖ k7 branch → concat → 1×1 fuse (blocks_MDUNet.py:132)."""

    features: int
    act: str = "relu"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        act = ops.get_act(self.act)
        # k3 branch: inner acts fixed to relu (reference passes no act), then IN + act
        x3 = ConvBlockK(self.features, 3, act="relu", dtype=self.dtype, name="branch3")(x, train)
        x3 = act(InstanceNorm(affine=False, name="branch3_norm")(x3))
        # k7 branch: BatchNorm+ReLU inside, then IN + act
        x7 = ConvBlockK(self.features, 7, norm="batch", act="relu", dtype=self.dtype, name="branch7")(x, train)
        x7 = act(InstanceNorm(affine=False, name="branch7_norm")(x7))
        y = jnp.concatenate([x3, x7], axis=-1)
        y = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="fuse")(y)
        return act(InstanceNorm(affine=False, name="fuse_norm")(y))


class DualDilatedBlock(fnn.Module):
    """k3 ‖ dilated(2) k3 ‖ dilated(3) k3 → 1×1 fuse (blocks_MDUNet.py:194)."""

    features: int
    act: str = "relu"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        act = ops.get_act(self.act)
        x3 = ConvBlockK(self.features, 3, act=self.act, dtype=self.dtype, name="branch3")(x, train)
        x5 = ConvBlockK(self.features, 3, dilation=2, act=self.act, dtype=self.dtype, name="branch5")(x, train)
        x7 = ConvBlockK(self.features, 3, dilation=3, act=self.act, dtype=self.dtype, name="branch7")(x, train)
        y = jnp.concatenate([x3, x5, x7], axis=-1)
        y = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="fuse")(y)
        return act(InstanceNorm(affine=False, name="fuse_norm")(y))


class AblationDualDilatedBlock(fnn.Module):
    """Ablation variant (blocks_MDUNet_ablation.py:118-140): same 3-branch
    topology but BatchNorm everywhere, Mish in the k3 branch and ReLU in the
    dilated branches + fuse (the commented-out act switches in the ablation
    file resolve to exactly this)."""

    features: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        x3 = ConvBlockK(self.features, 3, norm="batch", act="mish",
                        dtype=self.dtype, name="branch3")(x, train)
        x5 = ConvBlockK(self.features, 3, dilation=2, norm="batch", act="relu",
                        dtype=self.dtype, name="branch5")(x, train)
        x7 = ConvBlockK(self.features, 3, dilation=3, norm="batch", act="relu",
                        dtype=self.dtype, name="branch7")(x, train)
        y = jnp.concatenate([x3, x5, x7], axis=-1)
        y = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="fuse")(y)
        y = BatchNorm(name="fuse_norm")(y, use_running_average=not train)
        return ops.relu(y)


class MultiScaleConv(fnn.Module):
    """k3‖k5‖k7 (conv+ReLU, bias-free, no norm) → concat → 1×1 conv+ReLU
    (convs.py:41-61)."""

    features: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        outs = []
        for k, name in ((3, "conv3"), (5, "conv5"), (7, "conv7")):
            h = Conv3D(self.features, k, padding=k // 2, use_bias=False, dtype=self.dtype, name=name)(x)
            outs.append(ops.relu(h))
        y = jnp.concatenate(outs, axis=-1)
        y = Conv3D(self.features, 1, padding=0, use_bias=False, dtype=self.dtype, name="conv1")(y)
        return ops.relu(y)

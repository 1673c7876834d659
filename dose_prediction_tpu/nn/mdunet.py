"""Multi-scale / multi-kernel conv block family.

The reference keeps THREE divergent copies of these blocks; ``family``
selects between them:

- family='seg' (default) — OARSegmentation/Models/Nets/blocks_MDUNet.py:
  conv_3_1 (:132-157) is k3‖k7 with InstanceNorm+act OUTER stages on each
  branch and on the 1×1 fuse. Reference quirks reproduced: the k3 branch's
  inner activations are always ReLU (conv_block_3 built without the act
  argument), and the k7 branch uses BatchNorm3d+ReLU inside (conv_block_7).
  DualDilatedBlock (:194-215) is THREE branches (k3, dil-2 k3, dil-3 k3),
  InstanceNorm inside, IN+act on the fuse.
- family='dose' — DosePrediction/Models/Nets/blocks_MDUNet.py (what
  models_experiments.py:12 imports) and the identical
  OARSegmentation/OldModels/Nets/blocks_MDUNet.py: all inner blocks are
  BatchNorm3d+ReLU (conv_block_3 :64-78, conv_block_7 :115-129,
  dilated_conv_block_5 :98-112), conv_3_1 (:149-165) and DualDilatedBlock
  (:168-184) fuse with a BARE 1×1 conv — no outer norm or activation — and
  DualDilatedBlock has only TWO branches (k3 ‖ dil-2 k3). No act knob.
- family='ablation' — OARSegmentation/Models/Nets/blocks_MDUNet_ablation.py:
  inner blocks are BatchNorm3d + Mish for the k3/k7 branches (:7-38) and
  BatchNorm3d + ReLU for the dilated ones (:80-115); conv_3_1 (:41-71) keeps
  IN outer stages with an always-Mish quirk on the k3 branch (:50);
  DualDilatedBlock (:118-140) is 3-branch with a BatchNorm+ReLU fuse.

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

    ``separable=True`` replaces each dense k×k×k conv with a LINEAR chain of
    three 1-D convs — (k,1,1) mixing C_in→C_out, then channel-preserving
    (1,k,1) and (1,1,k) — before the same single norm+act. k³ taps become 3k
    (k=7: 343 → 21, ~16× fewer FLOPs where C stays equal), the structural
    attack on the measured seg-sweep k7 ceiling (docs/PERFORMANCE.md). NOT
    function-equivalent to the dense block: it is a different (smaller)
    hypothesis class — train with it, or warm-start from a dense checkpoint
    via nn/separable.py::separabilize_variables (HOSVD projection shim).
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    norm: str = "instance"
    act: str = "relu"
    separable: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        act = ops.get_act(self.act)
        for i in range(2):
            if self.separable and k > 1:
                # bias only on the last 1-D conv: the chain is linear, so one
                # bias reproduces the dense conv's single bias exactly
                x = Conv3D(self.features, (k, 1, 1), padding=(pad, 0, 0),
                           dilation=self.dilation, use_bias=False,
                           dtype=self.dtype, name=f"conv{i}_d")(x)
                x = Conv3D(self.features, (1, k, 1), padding=(0, pad, 0),
                           dilation=self.dilation, use_bias=False,
                           dtype=self.dtype, name=f"conv{i}_h")(x)
                x = Conv3D(self.features, (1, 1, k), padding=(0, 0, pad),
                           dilation=self.dilation,
                           dtype=self.dtype, name=f"conv{i}_w")(x)
            else:
                x = Conv3D(
                    self.features,
                    k,
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
    """conv_3_1: k3 branch ‖ k7 branch → concat → 1×1 fuse.

    family='seg' (blocks_MDUNet.py:132, IN outer stages), 'dose'
    (DosePrediction blocks_MDUNet.py:149 / OldModels — BN inner, bare fuse,
    ``act`` ignored), or 'ablation' (blocks_MDUNet_ablation.py:41 — Mish
    inner, always-Mish k3 outer quirk)."""

    features: int
    act: str = "relu"
    family: str = "seg"
    # 'dense' = reference parity (k7 = 343-tap convs); 'separable' = the
    # 1-D-chain k7 variant (ConvBlockK.separable — different weights, needs
    # training or the nn/separable.py warm-start shim)
    k7_mode: str = "dense"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        act = ops.get_act(self.act)
        sep = self.k7_mode == "separable"
        if self.family == "dose":
            # BatchNorm+ReLU inner blocks, bare 1×1 fuse (dose blocks_MDUNet.py:149-165)
            x3 = ConvBlockK(self.features, 3, norm="batch", act="relu",
                            dtype=self.dtype, name="branch3")(x, train)
            x7 = ConvBlockK(self.features, 7, norm="batch", act="relu",
                            separable=sep,
                            dtype=self.dtype, name="branch7")(x, train)
            y = jnp.concatenate([x3, x7], axis=-1)
            return Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="fuse")(y)
        if self.family == "ablation":
            # BN+Mish inner; IN outer; k3's outer act is Mish regardless of act
            # (blocks_MDUNet_ablation.py:50 resolves Mish for both arms)
            x3 = ConvBlockK(self.features, 3, norm="batch", act="mish",
                            dtype=self.dtype, name="branch3")(x, train)
            x3 = ops.mish(InstanceNorm(affine=False, name="branch3_norm")(x3))
            x7 = ConvBlockK(self.features, 7, norm="batch", act="mish",
                            separable=sep,
                            dtype=self.dtype, name="branch7")(x, train)
            x7 = act(InstanceNorm(affine=False, name="branch7_norm")(x7))
            y = jnp.concatenate([x3, x7], axis=-1)
            y = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="fuse")(y)
            return act(InstanceNorm(affine=False, name="fuse_norm")(y))
        # seg family
        # k3 branch: inner acts fixed to relu (reference passes no act), then IN + act
        x3 = ConvBlockK(self.features, 3, act="relu", dtype=self.dtype, name="branch3")(x, train)
        x3 = act(InstanceNorm(affine=False, name="branch3_norm")(x3))
        # k7 branch: BatchNorm+ReLU inside, then IN + act
        x7 = ConvBlockK(self.features, 7, norm="batch", act="relu",
                        separable=sep, dtype=self.dtype, name="branch7")(x, train)
        x7 = act(InstanceNorm(affine=False, name="branch7_norm")(x7))
        y = jnp.concatenate([x3, x7], axis=-1)
        y = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="fuse")(y)
        return act(InstanceNorm(affine=False, name="fuse_norm")(y))


class DualDilatedBlock(fnn.Module):
    """Multi-dilation block. family='seg': k3 ‖ dil-2 k3 ‖ dil-3 k3 → 1×1 +
    IN + act (seg blocks_MDUNet.py:194). family='dose': TWO branches
    (k3 ‖ dil-2 k3), BatchNorm inner, bare 1×1 fuse (dose
    blocks_MDUNet.py:168-184; ``act`` ignored). family='ablation': 3-branch
    BatchNorm variant, Mish k3 / ReLU dilated, BN+ReLU fuse
    (blocks_MDUNet_ablation.py:118-140)."""

    features: int
    act: str = "relu"
    family: str = "seg"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        act = ops.get_act(self.act)
        if self.family == "dose":
            x3 = ConvBlockK(self.features, 3, norm="batch", act="relu",
                            dtype=self.dtype, name="branch3")(x, train)
            x5 = ConvBlockK(self.features, 3, dilation=2, norm="batch", act="relu",
                            dtype=self.dtype, name="branch5")(x, train)
            y = jnp.concatenate([x3, x5], axis=-1)
            return Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="fuse")(y)
        if self.family == "ablation":
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
        # seg family
        x3 = ConvBlockK(self.features, 3, act=self.act, dtype=self.dtype, name="branch3")(x, train)
        x5 = ConvBlockK(self.features, 3, dilation=2, act=self.act, dtype=self.dtype, name="branch5")(x, train)
        x7 = ConvBlockK(self.features, 3, dilation=3, act=self.act, dtype=self.dtype, name="branch7")(x, train)
        y = jnp.concatenate([x3, x5, x7], axis=-1)
        y = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="fuse")(y)
        return act(InstanceNorm(affine=False, name="fuse_norm")(y))


def AblationDualDilatedBlock(features: int, dtype: Any = jnp.float32,
                             name: str | None = None) -> DualDilatedBlock:
    """Back-compat constructor for the ablation family (same param tree)."""
    return DualDilatedBlock(features, family="ablation", dtype=dtype, name=name)


def AblationConv31(features: int, act: str = "relu", dtype: Any = jnp.float32,
                   name: str | None = None) -> Conv31:
    """Ablation conv_3_1 (blocks_MDUNet_ablation.py:41-71)."""
    return Conv31(features, act=act, family="ablation", dtype=dtype, name=name)


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

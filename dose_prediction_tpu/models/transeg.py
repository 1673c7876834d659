"""OAR-TranSeg — multi-organ segmentation (UNETR variant with multi-scale
conv decoders).

Parity target: OARSegmentation/Models/Networks/oar_transeg.py:14-185 — MONAI
ViT (12 layers, hidden-state taps at indices 3/6/9), UnetrBasicBlock +
UnetrPrUpBlock encoders, ModifiedUnetrUpBlock decoders (default act='relu',
multiS_conv=True), 1×1 ModifiedUnetOutBlock head. Default out_channels =
7 OARs + background = 8 (test(), oar_transeg.py:192).

``block_family`` exposes the reference's seg-model matrix
(train_light_transeg.py:93-124):
- 'seg'  → the new-Models IN-flavored blocks (mode_model=1 with Models/);
- 'old'  → the OldModels TRANSEG flavor (BatchNorm conv_3_1 with a bare 1×1
  fuse — OldModels/Nets/blocks_MDUNet.py:132-148; what mode_model=1 actually
  imports via train_light_transeg.py:20);
- 'ablation' → base_blocks_ablation.py:9 swap-in.
The plain MONAI UNETR (mode_model=0) lives in models/unetr.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax
import jax.numpy as jnp

from dose_prediction_tpu.nn.unetr import (
    ModifiedUnetOutBlock,
    ModifiedUnetrUpBlock,
    UnetrBasicBlock,
    UnetrPrUpBlock,
)
from dose_prediction_tpu.nn.vit import ViT3D, unpatchify_tokens


class TranSeg(fnn.Module):
    out_ch: int = 8
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    pos_embed: str = "perceptron"
    norm: str = "instance"
    patch_size: int = 16
    act: str = "relu"
    multiS_conv: bool = True
    block_family: str = "seg"    # 'seg' | 'old' | 'ablation'
    # run a checkpoint trained on another token grid (e.g. (6,6,6) for 96³
    # crops) at a different volume size: the ViT pos-embedding is resized
    # (nn/vit.py PatchEmbed3D.trained_grid); every other block is fully
    # convolutional. Enables dense full-volume serve without sliding windows.
    trained_grid: Any = None
    # rematerialize each decoder stage during backprop (same per-block remat
    # as models/dose_pyfer.py: the full-resolution multi-scale stages dominate
    # activation memory; batch-4 96³ training OOMs by ~83 MB without it).
    # Param structure is unchanged — checkpoints stay compatible.
    remat_blocks: bool = False
    # 'separable' replaces every decoder k7 conv with a linear 1-D chain
    # (343 → 21 taps; the structural attack on the measured k7 sweep
    # ceiling). A DIFFERENT architecture: train with it, or warm-start from
    # a dense checkpoint via nn/separable.py (HOSVD shim) and fine-tune.
    # Default 'dense' keeps reference parity.
    k7_mode: str = "dense"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        family = {"seg": "seg", "old": "dose", "ablation": "ablation"}[self.block_family]
        n, d, h, w, _ = x.shape
        grid = (d // self.patch_size, h // self.patch_size, w // self.patch_size)
        fs = self.feature_size
        z_final, hidden = ViT3D(
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            patch_size=self.patch_size,
            pos_embed=self.pos_embed,
            trained_grid=self.trained_grid,
            dtype=self.dtype,
            name="vit",
        )(x)
        # hidden-state taps: indices 3/6/9 for the reference's fixed 12 layers
        # (oar_transeg.py:174-179); generalized as num_layers//4 multiples.
        i = self.num_layers // 4
        enc1 = UnetrBasicBlock(fs, norm=self.norm, dtype=self.dtype, name="encoder1")(x)
        enc2 = UnetrPrUpBlock(fs * 2, num_layer=2, norm=self.norm, dtype=self.dtype, name="encoder2")(
            unpatchify_tokens(hidden[i], grid)
        )
        enc3 = UnetrPrUpBlock(fs * 4, num_layer=1, norm=self.norm, dtype=self.dtype, name="encoder3")(
            unpatchify_tokens(hidden[i * 2], grid)
        )
        enc4 = UnetrPrUpBlock(fs * 8, num_layer=0, norm=self.norm, dtype=self.dtype, name="encoder4")(
            unpatchify_tokens(hidden[i * 3], grid)
        )
        dec4 = unpatchify_tokens(z_final, grid)
        mod_cls = ModifiedUnetrUpBlock
        if self.remat_blocks:
            mod_cls = fnn.remat(ModifiedUnetrUpBlock, static_argnums=(3,))
        dec3 = mod_cls(fs * 8, act=self.act, multiS_conv=self.multiS_conv,
                       family=family, k7_mode=self.k7_mode,
                       dtype=self.dtype, name="decoder5")(dec4, enc4, train)
        dec2 = mod_cls(fs * 4, act=self.act, multiS_conv=self.multiS_conv,
                       family=family, k7_mode=self.k7_mode,
                       dtype=self.dtype, name="decoder4")(dec3, enc3, train)
        dec1 = mod_cls(fs * 2, act=self.act, multiS_conv=self.multiS_conv,
                       family=family, k7_mode=self.k7_mode,
                       dtype=self.dtype, name="decoder3")(dec2, enc2, train)
        out = mod_cls(fs, act=self.act, multiS_conv=self.multiS_conv,
                      family=family, k7_mode=self.k7_mode,
                      dtype=self.dtype, name="decoder2")(dec1, enc1, train)
        return ModifiedUnetOutBlock(self.out_ch, dtype=self.dtype, name="out")(out)

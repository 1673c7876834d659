"""Plain MONAI UNETR — the seg-task mode_model=0 network
(OARSegmentation/train_light_transeg.py:93-107): ViT patch-16 encoder with
hidden-state taps at layers 3/6/9, UnetrBasicBlock + UnetrPrUpBlock skip
encoders, UnetrUpBlock decoders with res_block=True (the trainer's setting —
UnetResBlock conv stages, not basic blocks), 1×1 out head (MONAI UNETR
semantics, feature_size=16, hidden 768, mlp 3072, 12 heads, perceptron
pos-embed, instance norm, dropout 0).
"""

from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax
import jax.numpy as jnp

from dose_prediction_tpu.nn.layers import Conv3D
from dose_prediction_tpu.nn.unetr import (
    UnetrBasicBlock,
    UnetrPrUpBlock,
    UnetrUpBlock,
)
from dose_prediction_tpu.nn.vit import ViT3D, unpatchify_tokens


class UNETR(fnn.Module):
    out_ch: int = 8              # 7 OARs + background (train_light_transeg.py:95)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    pos_embed: str = "perceptron"
    norm: str = "instance"
    patch_size: int = 16
    res_block: bool = True       # the trainer passes res_block=True (:104)
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        n, d, h, w, _ = x.shape
        grid = (d // self.patch_size, h // self.patch_size, w // self.patch_size)
        fs = self.feature_size
        z_final, hidden = ViT3D(
            hidden_size=self.hidden_size, mlp_dim=self.mlp_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            patch_size=self.patch_size, pos_embed=self.pos_embed,
            dtype=self.dtype, name="vit")(x)
        i = self.num_layers // 4
        enc1 = UnetrBasicBlock(fs, norm=self.norm, dtype=self.dtype, name="encoder1")(x)
        enc2 = UnetrPrUpBlock(fs * 2, num_layer=2, norm=self.norm, dtype=self.dtype,
                              name="encoder2")(unpatchify_tokens(hidden[i], grid))
        enc3 = UnetrPrUpBlock(fs * 4, num_layer=1, norm=self.norm, dtype=self.dtype,
                              name="encoder3")(unpatchify_tokens(hidden[i * 2], grid))
        enc4 = UnetrPrUpBlock(fs * 8, num_layer=0, norm=self.norm, dtype=self.dtype,
                              name="encoder4")(unpatchify_tokens(hidden[i * 3], grid))
        dec4 = unpatchify_tokens(z_final, grid)
        dec3 = UnetrUpBlock(fs * 8, norm=self.norm, res_block=self.res_block, dtype=self.dtype, name="decoder5")(dec4, enc4)
        dec2 = UnetrUpBlock(fs * 4, norm=self.norm, res_block=self.res_block, dtype=self.dtype, name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(fs * 2, norm=self.norm, res_block=self.res_block, dtype=self.dtype, name="decoder3")(dec2, enc2)
        out = UnetrUpBlock(fs, norm=self.norm, res_block=self.res_block, dtype=self.dtype, name="decoder2")(dec1, enc1)
        return Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="out")(out)

"""DOSE-PYFER — the paper's flagship cascade dose-prediction model.

Parity target: DosePrediction/Models/Networks/dose_pyfer.py:
- ViTEncoder (:22): 3D ViT (perceptron patch embed) + UnetrBasicBlock skip1 +
  UnetrPrUpBlock skips 2-4, hidden-state taps at layers L/4, L/2, 3L/4.
- PyMSCDecoder (:150): 4 × ModifiedUnetrUpBlock (multi-scale conv stages).
- MainSubsetModel (:245): encoder + decoder + per-scale 1×1 dose convertors
  (deep supervision at 1×, ½, ¼, ⅛ resolution).
- Model (:325): cascade net_A = C3D BaseUNet(list_ch_A=[-1,16,32,64,128,256])
  → net_B = MainSubsetModel(cat(out_A, x)); conv_out_A 1×1 head.

Flagship config (train_light_pyfer.py:73-83): in_ch=9, out_ch=1, img 128³,
feature_size=16, hidden=768, mlp=3072, num_layers=8, num_heads=6, act='mish',
mode_multi_dec=True, multiS_conv=True.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from dose_prediction_tpu.models.c3d import BaseUNet
from dose_prediction_tpu.nn.layers import Conv3D
from dose_prediction_tpu.nn.unetr import (
    ModifiedUnetrUpBlock,
    UnetrBasicBlock,
    UnetrPrUpBlock,
    UnetrUpBlock,
)
from dose_prediction_tpu.nn.vit import ViT3D, unpatchify_tokens


class ViTEncoder(fnn.Module):
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    pos_embed: str = "perceptron"
    norm: str = "instance"
    patch_size: int = 16
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x) -> List[jax.Array]:
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
            dtype=self.dtype,
            name="vit",
        )(x)
        i = self.num_layers // 4
        enc1 = UnetrBasicBlock(fs, norm=self.norm, dtype=self.dtype, name="skip1")(x)
        enc2 = UnetrPrUpBlock(fs * 2, num_layer=2, norm=self.norm, dtype=self.dtype, name="skip2")(
            unpatchify_tokens(hidden[i], grid)
        )
        enc3 = UnetrPrUpBlock(fs * 4, num_layer=1, norm=self.norm, dtype=self.dtype, name="skip3")(
            unpatchify_tokens(hidden[i * 2], grid)
        )
        enc4 = UnetrPrUpBlock(fs * 8, num_layer=0, norm=self.norm, dtype=self.dtype, name="skip4")(
            unpatchify_tokens(hidden[i * 3], grid)
        )
        enc5 = unpatchify_tokens(z_final, grid)
        return [enc1, enc2, enc3, enc4, enc5]


class PyMSCDecoder(fnn.Module):
    feature_size: int = 16
    norm: str = "instance"
    mode_multi: bool = False
    act: str = "relu"
    multiS_conv: bool = True
    # rematerialize each decoder stage during backprop (per-block remat: the
    # multi-scale stages at full resolution dominate activation memory;
    # whole-model jax.checkpoint measured WORSE peak memory)
    remat_blocks: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, enc_outs, train: bool = True) -> List[jax.Array]:
        e1, e2, e3, e4, e5 = enc_outs
        fs = self.feature_size
        mod_cls = ModifiedUnetrUpBlock
        up_cls = UnetrUpBlock
        if self.remat_blocks:
            mod_cls = fnn.remat(ModifiedUnetrUpBlock, static_argnums=(3,))
            up_cls = fnn.remat(UnetrUpBlock)
        stages = []
        x = e5
        for idx, (features, skip) in enumerate(((fs * 8, e4), (fs * 4, e3), (fs * 2, e2), (fs, e1))):
            name = f"decoder{4 - idx}"
            if self.mode_multi:
                x = mod_cls(
                    features, act=self.act, multiS_conv=self.multiS_conv,
                    dtype=self.dtype, name=name,
                )(x, skip, train)
            else:
                x = up_cls(features, norm=self.norm, dtype=self.dtype, name=name)(x, skip)
            stages.append(x)
        dec4, dec3, dec2, dec1 = stages
        return [dec1, dec2, dec3, dec4]


class MainSubsetModel(fnn.Module):
    """net_B: ViT encoder + pyramid multi-scale decoder + deep-supervision heads."""

    out_ch: int = 1
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    mode_multi_dec: bool = False
    act: str = "relu"
    multiS_conv: bool = True
    remat_blocks: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> List[jax.Array]:
        enc_outs = ViTEncoder(
            feature_size=self.feature_size,
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="encoder",
        )(x)
        decs = PyMSCDecoder(
            feature_size=self.feature_size,
            mode_multi=self.mode_multi_dec,
            act=self.act,
            multiS_conv=self.multiS_conv,
            remat_blocks=self.remat_blocks,
            dtype=self.dtype,
            name="decoder",
        )(enc_outs, train)
        outputs = []
        for i, dec in enumerate(decs):
            outputs.append(
                Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name=f"dose_convertor{i}")(dec)
            )
        return outputs


class DosePyfer(fnn.Module):
    """The cascade model (dose_pyfer.py Model :325).

    Returns ``(output_A, [out_full, out_half, out_quarter, out_eighth])``.
    """

    out_ch: int = 1
    list_ch_A: Sequence[int] = (-1, 16, 32, 64, 128, 256)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 8
    num_heads: int = 6
    act: str = "mish"
    mode_multi_dec: bool = True
    multiS_conv: bool = True
    remat_blocks: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True,
                 stop_gradient_a: bool = False) -> Tuple[jax.Array, List[jax.Array]]:
        out_a = BaseUNet(self.list_ch_A, dtype=self.dtype, name="net_A")(x)
        if stop_gradient_a:
            # frozen-net_A training (train_light_pyfer.py:85-88): cutting the
            # gradient here lets XLA drop net_A's entire backward pass AND its
            # saved activations — torch's requires_grad=False does the same;
            # an optax zero-update mask alone still back-propagates through A.
            out_a = jax.lax.stop_gradient(out_a)
        outs_b = MainSubsetModel(
            out_ch=self.out_ch,
            feature_size=self.feature_size,
            hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            mode_multi_dec=self.mode_multi_dec,
            act=self.act,
            multiS_conv=self.multiS_conv,
            remat_blocks=self.remat_blocks,
            dtype=self.dtype,
            name="net_B",
        )(jnp.concatenate([out_a, x], axis=-1), train)
        pred_a = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="conv_out_A")(out_a)
        return pred_a, outs_b

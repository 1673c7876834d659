"""Experimental model zoo — ablation/experiment variants.

Parity target: DosePrediction/Models/Networks/models_experiments.py (1589 LoC
of encoder/decoder/cascade variants). Re-composed from the framework's shared
blocks rather than transcribed:

- attention gates: AttGateExp (1×1 convs + BN + sigmoid, :79) and
  MultiAttGate (conv_3_1 core, :52);
- encoders: SharedEncoder (:247, 4-level, single first conv),
  DilatedSharedEncoder (:275, maxpool + DualDilatedBlock),
  DilatedEncoder (:356, 5-level), InitialEncoderA (:301);
- decoders: SharedDecoder (:486), DilatedSharedDecoder (:521, conv_3_1),
  AttDecoder (:591), PureAttDecoder (:652), PureMultiAttDecoder (:702);
  MonaiSharedDecoder ≡ PyMSCDecoder (same construction, :394);
- models: VitGenerator (:769; the active model in train_light_exp_models.py
  — ViT encoder + pyramid decoder + deep-supervision heads, non-cascade),
  SharedEncoderModel (:841; one ViT encoder, two decoders, A→B feature
  concatenation per scale, tanh heads), ExperimentalCascade (:1499; pluggable
  encoder/decoder modes), SharedUNetModel (:911; weight-shared encoder across
  both cascade stages), ResNet3D/resnet10 (MedicalNet-style, GAN
  discriminator backbone for train_light_gan.py:124-138).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from dose_prediction_tpu import ops
from dose_prediction_tpu.models.dose_pyfer import PyMSCDecoder, ViTEncoder
from dose_prediction_tpu.nn.blocks import SingleConv, UpConv
from dose_prediction_tpu.nn.layers import BatchNorm, Conv3D
from dose_prediction_tpu.nn.mdunet import Conv31, DualDilatedBlock


class AttGateExp(fnn.Module):
    """Additive attention gate (models_experiments.py:79-101): shared 1×1 conv,
    ReLU→1×1→BN→sigmoid, multiplied onto the gated input."""

    features: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, down_inp, sample_inp, train: bool = True):
        initial = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="initial_conv")
        z1 = initial(down_inp)
        z2 = initial(sample_inp)
        g = ops.relu(z1 + z2)
        g = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="inter_conv")(g)
        g = BatchNorm(name="inter_norm")(g, use_running_average=not train)
        return z1 * ops.sigmoid(g)


class MultiAttGate(fnn.Module):
    """Attention gate with a conv_3_1 multi-scale core (:52-76)."""

    features: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, down_inp, sample_inp, train: bool = True):
        initial = Conv3D(self.features, 1, padding=0, dtype=self.dtype, name="initial_conv")
        z1 = initial(down_inp)
        z2 = initial(sample_inp)
        g = ops.relu(z1 + z2)
        g = Conv31(self.features, family="dose", dtype=self.dtype, name="inter_conv31")(g, train)
        g = BatchNorm(name="inter_norm")(g, use_running_average=not train)
        return z1 * ops.sigmoid(g)


class SharedEncoder(fnn.Module):
    """4-level plain encoder, single conv at level 1 (:247-271)."""

    list_ch: Sequence[int]
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x) -> List[jax.Array]:
        ch = self.list_ch
        outs = []
        x = SingleConv(ch[1], 3, 1, 1, dtype=self.dtype, name="enc1_conv")(x)
        outs.append(x)
        for level in (2, 3, 4):
            x = SingleConv(ch[level], 3, 2, 1, dtype=self.dtype, name=f"enc{level}_down")(x)
            x = SingleConv(ch[level], 3, 1, 1, dtype=self.dtype, name=f"enc{level}_conv")(x)
            outs.append(x)
        return outs


class DilatedSharedEncoder(fnn.Module):
    """4-level encoder: maxpool + DualDilatedBlock per level (:275-297)."""

    list_ch: Sequence[int]
    act: str = "relu"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> List[jax.Array]:
        ch = self.list_ch
        outs = []
        x = SingleConv(ch[1], 3, 1, 1, dtype=self.dtype, name="enc1_conv")(x)
        outs.append(x)
        for level in (2, 3, 4):
            x = ops.max_pool3d(x, 2)
            x = DualDilatedBlock(ch[level], family="dose", dtype=self.dtype,
                                 name=f"enc{level}_dual")(x, train)
            outs.append(x)
        return outs


class DilatedEncoder(fnn.Module):
    """5-level DualDilatedBlock encoder (:356-390)."""

    list_ch: Sequence[int]
    act: str = "relu"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> List[jax.Array]:
        ch = self.list_ch
        outs = []
        x = DualDilatedBlock(ch[1], family="dose", dtype=self.dtype, name="enc1_dual")(x, train)
        outs.append(x)
        for level in (2, 3, 4, 5):
            x = ops.max_pool3d(x, 2)
            x = DualDilatedBlock(ch[level], family="dose", dtype=self.dtype,
                                 name=f"enc{level}_dual")(x, train)
            outs.append(x)
        return outs


class InitialEncoderA(fnn.Module):
    """Stem producing (full-res features, strided-down features) (:301-319)."""

    mid_ch: int
    down_ch: int
    mode: int = 1
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        if self.mode == 1:
            h = SingleConv(self.mid_ch, 3, 1, 1, dtype=self.dtype, name="conv1")(x)
            h = SingleConv(self.mid_ch, 3, 1, 1, dtype=self.dtype, name="conv2")(h)
        else:
            h = DualDilatedBlock(self.mid_ch, family="dose", dtype=self.dtype, name="dual")(x, train)
        down = SingleConv(self.down_ch, 3, 2, 1, dtype=self.dtype, name="down")(h)
        return h, down


class SharedDecoder(fnn.Module):
    """3-up plain decoder over 4 encoder scales (:486-517)."""

    list_ch: Sequence[int]
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, enc_outs) -> jax.Array:
        ch = self.list_ch
        e1, e2, e3, e4 = enc_outs
        x = e4
        for level, skip in ((3, e3), (2, e2)):
            x = UpConv(ch[level], dtype=self.dtype, name=f"up{level}")(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = SingleConv(ch[level], 3, 1, 1, dtype=self.dtype, name=f"dec{level}_c1")(x)
            x = SingleConv(ch[level], 3, 1, 1, dtype=self.dtype, name=f"dec{level}_c2")(x)
        x = UpConv(ch[1], dtype=self.dtype, name="up1")(x)
        x = jnp.concatenate([x, e1], axis=-1)
        return SingleConv(ch[1], 3, 1, 1, dtype=self.dtype, name="dec1_c1")(x)


class DilatedSharedDecoder(fnn.Module):
    """Like SharedDecoder but conv_3_1 decoder blocks (:521-544)."""

    list_ch: Sequence[int]
    act: str = "relu"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, enc_outs, train: bool = True) -> jax.Array:
        ch = self.list_ch
        e1, e2, e3, e4 = enc_outs
        x = e4
        for level, skip in ((3, e3), (2, e2)):
            x = UpConv(ch[level], dtype=self.dtype, name=f"up{level}")(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = Conv31(ch[level], family="dose", dtype=self.dtype, name=f"dec{level}_c31")(x, train)
        x = UpConv(ch[1], dtype=self.dtype, name="up1")(x)
        x = jnp.concatenate([x, e1], axis=-1)
        return SingleConv(ch[1], 3, 1, 1, dtype=self.dtype, name="dec1_conv")(x)


class _GatedDecoder(fnn.Module):
    """Common 4-up attention-gated decoder machinery (:591-766): each level
    upsamples, gates the encoder skip against the upsample, concatenates
    (up, gated) and convolves. ``gate`` picks AttGateExp or MultiAttGate;
    ``double_conv`` picks one or two decoder convs per level."""

    list_ch: Sequence[int]
    gate: str = "att"          # 'att' | 'multi'
    double_conv: bool = True
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, enc_outs, train: bool = True) -> jax.Array:
        ch = self.list_ch
        e1, e2, e3, e4, e5 = enc_outs
        gate_cls = AttGateExp if self.gate == "att" else MultiAttGate
        x = e5
        for level, skip in ((4, e4), (3, e3), (2, e2), (1, e1)):
            up = UpConv(ch[level], dtype=self.dtype, name=f"up{level}")(x)
            gated = gate_cls(ch[level], dtype=self.dtype, name=f"gate{level}")(skip, up, train)
            x = jnp.concatenate([up, gated], axis=-1)
            x = SingleConv(ch[level], 3, 1, 1, dtype=self.dtype, name=f"dec{level}_c1")(x)
            if self.double_conv and level > 1:
                x = SingleConv(ch[level], 3, 1, 1, dtype=self.dtype, name=f"dec{level}_c2")(x)
        return x


def AttDecoder(list_ch, dtype=jnp.float32, name=None):
    return _GatedDecoder(list_ch, gate="att", double_conv=True, dtype=dtype, name=name)


def PureAttDecoder(list_ch, dtype=jnp.float32, name=None):
    return _GatedDecoder(list_ch, gate="att", double_conv=False, dtype=dtype, name=name)


def PureMultiAttDecoder(list_ch, dtype=jnp.float32, name=None):
    return _GatedDecoder(list_ch, gate="multi", double_conv=False, dtype=dtype, name=name)


class VitGenerator(fnn.Module):
    """Non-cascade ViT generator (:769-838) — the active TestModel in
    train_light_exp_models.py:117-131. Encoder/decoder identical to the
    DOSE-PYFER net_B; returns the 4 deep-supervision outputs."""

    out_ch: int = 1
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    mode_multi_dec: bool = False
    act: str = "relu"
    multiS_conv: bool = True
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> List[jax.Array]:
        enc_outs = ViTEncoder(
            feature_size=self.feature_size, hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim, num_heads=self.num_heads,
            num_layers=self.num_layers, dtype=self.dtype, name="encoder")(x)
        decs = PyMSCDecoder(
            feature_size=self.feature_size, mode_multi=self.mode_multi_dec,
            act=self.act, multiS_conv=self.multiS_conv, dtype=self.dtype,
            name="decoder")(enc_outs, train)
        return [
            Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name=f"dose_convertor{i}")(d)
            for i, d in enumerate(decs)
        ]


class SharedEncoderModel(fnn.Module):
    """One ViT encoder, two pyramid decoders; stage-B encoder features are
    cat(enc_scale, dec_a_scale); tanh output heads (:841-908)."""

    out_ch: int = 1
    feature_size_a: int = 16
    feature_size_b: int = 32
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        enc_outs = ViTEncoder(
            feature_size=self.feature_size_a, hidden_size=self.hidden_size,
            mlp_dim=self.mlp_dim, num_heads=self.num_heads,
            num_layers=self.num_layers, dtype=self.dtype, name="encoder")(x)
        dec_a = PyMSCDecoder(feature_size=self.feature_size_a, dtype=self.dtype,
                             name="decoder_a")(enc_outs, train)
        out_a = ops.tanh(Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype,
                                name="out_a")(dec_a[0]))
        enc_b = [jnp.concatenate([e, d], axis=-1) for e, d in zip(enc_outs[:-1], dec_a)]
        enc_b.append(enc_outs[-1])
        dec_b = PyMSCDecoder(feature_size=self.feature_size_b, dtype=self.dtype,
                             name="decoder_b")(enc_b, train)
        out_b = ops.tanh(Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype,
                                name="out_b")(dec_b[0]))
        return out_a, out_b


class ExperimentalBaseUNet(fnn.Module):
    """Pluggable encoder/decoder U-Net (:1449-1496): encoder mode 1=plain,
    2=dilated; decoder mode 1=plain, 3=attention, 4=pure-att, 5=pure-multi-att."""

    list_ch: Sequence[int]
    mode_encoder: int = 1
    mode_decoder: int = 1
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        from dose_prediction_tpu.models.c3d import Decoder as PlainDecoder, Encoder as PlainEncoder

        if self.mode_encoder == 1:
            enc = PlainEncoder(self.list_ch, dtype=self.dtype, name="encoder")(x)
        else:
            enc = DilatedEncoder(self.list_ch, dtype=self.dtype, name="encoder")(x, train)
        if self.mode_decoder == 1:
            return PlainDecoder(self.list_ch, dtype=self.dtype, name="decoder")(enc)
        gate_map = {3: ("att", True), 4: ("att", False), 5: ("multi", False)}
        gate, double = gate_map[self.mode_decoder]
        return _GatedDecoder(self.list_ch, gate=gate, double_conv=double,
                             dtype=self.dtype, name="decoder")(enc, train)


class ExperimentalCascade(fnn.Module):
    """Cascade over pluggable stage networks (:1499-1520)."""

    out_ch: int = 1
    list_ch_A: Sequence[int] = (-1, 16, 32, 64, 128, 256)
    list_ch_B: Sequence[int] = (-1, 32, 64, 128, 256, 512)
    mode_encoder_A: int = 1
    mode_encoder_B: int = 1
    mode_decoder_A: int = 1
    mode_decoder_B: int = 1
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        out_a = ExperimentalBaseUNet(self.list_ch_A, self.mode_encoder_A,
                                     self.mode_decoder_A, dtype=self.dtype,
                                     name="net_A")(x, train)
        out_b = ExperimentalBaseUNet(self.list_ch_B, self.mode_encoder_B,
                                     self.mode_decoder_B, dtype=self.dtype,
                                     name="net_B")(jnp.concatenate([out_a, x], -1), train)
        pred_a = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="conv_out_A")(out_a)
        pred_b = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="conv_out_B")(out_b)
        return pred_a, pred_b


class SharedUNetModel(fnn.Module):
    """Cascade with one WEIGHT-SHARED encoder+decoder for both stages
    (:911-1008): stage A runs stem→shared U→head; stage B re-runs the same
    shared U on cat(out_A, input) with an extra bottleneck."""

    out_ch: int = 1
    list_ch: Sequence[int] = (-1, 16, 32, 64, 128, 256, 512)
    mode_encoder: int = 1
    mode_decoder: int = 1
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        ch = self.list_ch
        inner_ch = [-1] + list(ch[2:-1])
        if self.mode_encoder == 1:
            shared_encoder = SharedEncoder(inner_ch, dtype=self.dtype, name="shared_encoder")
        else:
            shared_encoder = DilatedSharedEncoder(inner_ch, dtype=self.dtype, name="shared_encoder")
        if self.mode_decoder == 1:
            shared_decoder = SharedDecoder(inner_ch, dtype=self.dtype, name="shared_decoder")
        else:
            shared_decoder = DilatedSharedDecoder(inner_ch, dtype=self.dtype, name="shared_decoder")

        def run_shared_enc(h):
            if self.mode_encoder == 1:
                return shared_encoder(h)
            return shared_encoder(h, train)

        def run_shared_dec(enc):
            if self.mode_decoder == 1:
                return shared_decoder(enc)
            return shared_decoder(enc, train)

        # stage A
        conv, down = InitialEncoderA(ch[1], ch[2], mode=self.mode_encoder,
                                     dtype=self.dtype, name="initial_encoder_a")(x, train)
        enc_a = run_shared_enc(down)
        dec_a = run_shared_dec(enc_a)
        dec_a = SingleConv(ch[2], 3, 1, 1, dtype=self.dtype, name="decoder_a_conv")(dec_a)
        dec_a = UpConv(ch[1], dtype=self.dtype, name="decoder_a_up")(dec_a)
        out_dec_a = SingleConv(ch[1], 3, 1, 1, dtype=self.dtype, name="out_decoder_a")(
            jnp.concatenate([conv, dec_a], axis=-1))

        # stage B through the SAME shared encoder/decoder (flax reuse by name)
        xb = SingleConv(ch[2], 3, 1, 1, dtype=self.dtype, name="initial_encoder_b")(
            jnp.concatenate([out_dec_a, x], axis=-1))
        enc_b = run_shared_enc(xb)
        if self.mode_encoder == 1:
            bott = SingleConv(ch[6], 3, 2, 1, dtype=self.dtype, name="bottleneck_down")(enc_b[-1])
            bott = SingleConv(ch[6], 3, 1, 1, dtype=self.dtype, name="bottleneck_conv")(bott)
        else:
            bott = ops.max_pool3d(enc_b[-1], 2)
            bott = DualDilatedBlock(ch[6], family="dose", dtype=self.dtype, name="bottleneck_dual")(bott, train)
        bott = UpConv(ch[5], dtype=self.dtype, name="bottleneck_up")(bott)
        merged = jnp.concatenate([enc_b[-1], bott], axis=-1)
        merged = SingleConv(ch[5], 3, 1, 1, dtype=self.dtype, name="out_bottleneck_c1")(merged)
        enc_b[-1] = SingleConv(ch[5], 3, 1, 1, dtype=self.dtype, name="out_bottleneck_c2")(merged)
        dec_b = run_shared_dec(enc_b)

        out_a = ops.tanh(Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype,
                                name="conv_out_a")(out_dec_a))
        out_b = ops.tanh(Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype,
                                name="conv_out_b")(dec_b))
        return out_a, out_b


class SharedUNetRModelA(fnn.Module):
    """Shared-ViT UNETR cascade stub A (:1289-1448): a single UNETR pass whose
    head is returned for both cascade slots (outA, outA) — the reference's
    simplified shared variant. ViT taps at 3/6/9 like TranSeg; plain
    UnetrUpBlock decoders; UnetOutBlock head."""

    out_ch: int = 1
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch_size: int = 16
    norm: str = "instance"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        from dose_prediction_tpu.nn.unetr import (
            UnetrBasicBlock,
            UnetrPrUpBlock,
            UnetrUpBlock,
        )
        from dose_prediction_tpu.nn.vit import ViT3D, unpatchify_tokens

        n, d, h, w, _ = x.shape
        grid = (d // self.patch_size, h // self.patch_size, w // self.patch_size)
        fs = self.feature_size
        z_final, hidden = ViT3D(
            hidden_size=self.hidden_size, mlp_dim=self.mlp_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            patch_size=self.patch_size, dtype=self.dtype, name="vit")(x)
        i = self.num_layers // 4
        e1 = UnetrBasicBlock(fs, norm=self.norm, dtype=self.dtype, name="skip1")(x)
        e2 = UnetrPrUpBlock(fs * 2, num_layer=2, norm=self.norm, dtype=self.dtype,
                            name="skip2")(unpatchify_tokens(hidden[i], grid))
        e3 = UnetrPrUpBlock(fs * 4, num_layer=1, norm=self.norm, dtype=self.dtype,
                            name="skip3")(unpatchify_tokens(hidden[i * 2], grid))
        e4 = UnetrPrUpBlock(fs * 8, num_layer=0, norm=self.norm, dtype=self.dtype,
                            name="skip4")(unpatchify_tokens(hidden[i * 3], grid))
        dec4 = unpatchify_tokens(z_final, grid)
        d4 = UnetrUpBlock(fs * 8, norm=self.norm, dtype=self.dtype, name="decoder4")(dec4, e4)
        d3 = UnetrUpBlock(fs * 4, norm=self.norm, dtype=self.dtype, name="decoder3")(d4, e3)
        d2 = UnetrUpBlock(fs * 2, norm=self.norm, dtype=self.dtype, name="decoder2")(d3, e2)
        d1 = UnetrUpBlock(fs, norm=self.norm, dtype=self.dtype, name="decoder1")(d2, e1)
        out_a = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="out_a")(d1)
        return out_a, out_a


class SharedUNetRModel(fnn.Module):
    """Shared-ViT two-stage UNETR cascade (:1028-1288): ONE ViT encodes both
    stages (stage A on a 1×1-projected input, stage B on cat(dec_A, input));
    stage A decodes a 4-level pyramid from taps 2/4/6/8/10, stage B re-taps
    the ViT and decodes a deeper pyramid through shared decoder stages plus
    B-only refinement blocks (skipNB).
    """

    in_ch_b: int
    out_ch: int = 1
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch_size: int = 16
    norm: str = "instance"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        from dose_prediction_tpu.nn.unetr import UnetrPrUpBlock, UnetrUpBlock
        from dose_prediction_tpu.nn.vit import ViT3D, unpatchify_tokens

        n, d, h, w, cin = x.shape
        grid = (d // self.patch_size, h // self.patch_size, w // self.patch_size)
        fs = self.feature_size
        vit = ViT3D(hidden_size=self.hidden_size, mlp_dim=self.mlp_dim,
                    num_layers=self.num_layers, num_heads=self.num_heads,
                    patch_size=self.patch_size, dtype=self.dtype, name="vit")
        skip1 = UnetrPrUpBlock(fs, num_layer=3, norm=self.norm, dtype=self.dtype, name="skip1")
        skip2 = UnetrPrUpBlock(fs * 2, num_layer=2, norm=self.norm, dtype=self.dtype, name="skip2")
        skip3 = UnetrPrUpBlock(fs * 4, num_layer=1, norm=self.norm, dtype=self.dtype, name="skip3")
        skip4 = UnetrPrUpBlock(fs * 8, num_layer=0, norm=self.norm, dtype=self.dtype, name="skip4")
        skip5 = Conv3D(fs * 16, 1, padding=0, dtype=self.dtype, name="skip5")
        dec3 = UnetrUpBlock(fs * 8, norm=self.norm, dtype=self.dtype, name="decoder3")
        dec2 = UnetrUpBlock(fs * 4, norm=self.norm, dtype=self.dtype, name="decoder2")
        dec1 = UnetrUpBlock(fs * 2, norm=self.norm, dtype=self.dtype, name="decoder1")
        dec_a = UnetrUpBlock(fs, norm=self.norm, dtype=self.dtype, name="decoder_a")

        # stage A: project to the shared ViT's channel count
        xa = Conv3D(self.in_ch_b, 1, padding=0, dtype=self.dtype, name="initial_a")(x)
        _, hidden = vit(xa)
        x2a = skip1(unpatchify_tokens(hidden[2], grid))
        x4a = skip2(unpatchify_tokens(hidden[4], grid))
        x6a = skip3(unpatchify_tokens(hidden[6], grid))
        x8a = skip4(unpatchify_tokens(hidden[8], grid))
        x10a = skip5(unpatchify_tokens(hidden[10], grid))
        d8 = dec3(x10a, x8a)
        d6 = dec2(d8, x6a)
        d4 = dec1(d6, x4a)
        d2a = dec_a(d4, x2a)
        out_a = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="out_a")(d2a)

        # stage B through the SAME ViT and decoder stages
        xb = jnp.concatenate([d2a, x], axis=-1)
        if xb.shape[-1] != self.in_ch_b:
            raise ValueError(
                f"stage-B input channels {xb.shape[-1]} != in_ch_b {self.in_ch_b} "
                f"(need feature_size + in_ch == in_ch_b)")
        z12, hidden_b = vit(xb)
        x4b = UnetrPrUpBlock(fs * 2, num_layer=0, norm=self.norm, dtype=self.dtype,
                             name="skip2B")(skip2(unpatchify_tokens(hidden_b[4], grid)))
        x6b = UnetrPrUpBlock(fs * 4, num_layer=0, norm=self.norm, dtype=self.dtype,
                             name="skip3B")(skip3(unpatchify_tokens(hidden_b[6], grid)))
        x8b = UnetrPrUpBlock(fs * 8, num_layer=0, norm=self.norm, dtype=self.dtype,
                             name="skip4B")(skip4(unpatchify_tokens(hidden_b[8], grid)))
        x10b = UnetrPrUpBlock(fs * 16, num_layer=0, norm=self.norm, dtype=self.dtype,
                              name="skip5B")(skip5(unpatchify_tokens(hidden_b[10], grid)))
        x12b = Conv3D(fs * 32, 1, padding=0, dtype=self.dtype, name="skip6B")(
            unpatchify_tokens(z12, grid))
        db = UnetrUpBlock(fs * 16, norm=self.norm, dtype=self.dtype, name="decoder_b")(x12b, x10b)
        db = dec3(db, x8b)
        db = dec2(db, x6b)
        db = dec1(db, x4b)
        out_b = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="out_b")(db)
        return out_a, out_b


class MonaiUNet(fnn.Module):
    """MONAI UNet semantics (residual-unit encoder/decoder U-Net): stride-2
    conv + residual unit per level, transposed-conv decoder — the net used by
    ModelMonai (:1522-1554). Channels per level from ``channels``; strides 2."""

    out_ch: int
    channels: Sequence[int] = (16, 32, 64, 128, 256)
    norm: str = "instance"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        from dose_prediction_tpu.nn.layers import ConvTranspose3D
        from dose_prediction_tpu.nn.unetr import UnetResBlock

        chans = list(self.channels)
        skips = []
        h = x
        for i, c in enumerate(chans[:-1]):
            h = UnetResBlock(c, stride=2 if i > 0 else 1, norm=self.norm,
                             dtype=self.dtype, name=f"down{i}")(h)
            skips.append(h)
        h = UnetResBlock(chans[-1], stride=2, norm=self.norm, dtype=self.dtype,
                         name="bottom")(h)
        for i in reversed(range(len(chans) - 1)):
            h = ConvTranspose3D(chans[i], 2, stride=2, use_bias=False,
                                dtype=self.dtype, name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = UnetResBlock(chans[i], norm=self.norm, dtype=self.dtype,
                             name=f"dec{i}")(h)
        return Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="out")(h)


class ModelMonai(fnn.Module):
    """MONAI-UNet cascade (:1522-1554): net_A outputs list_ch_A[1] feature
    channels, net_B consumes cat(out_A, x) and emits the dose; 1×1 head on A."""

    out_ch: int = 1
    feat_ch_a: int = 16
    channels_a: Sequence[int] = (16, 32, 64, 128, 256)
    channels_b: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        out_net_a = MonaiUNet(self.feat_ch_a, self.channels_a, dtype=self.dtype,
                              name="net_A")(x)
        out_b = MonaiUNet(1, self.channels_b, dtype=self.dtype, name="net_B")(
            jnp.concatenate([out_net_a, x], axis=-1))
        out_a = Conv3D(self.out_ch, 1, padding=0, dtype=self.dtype, name="conv_out_A")(out_net_a)
        return out_a, out_b


# ---------------------------------------------------------------------------
# MedicalNet-style 3D ResNet (GAN discriminator backbone,
# train_light_gan.py:124-138, create_pretrained_medical_resnet :1555-1588)
# ---------------------------------------------------------------------------

class ResBlock3D(fnn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        h = Conv3D(self.features, 3, stride=self.stride, padding=1, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(name="bn1")(h, use_running_average=not train)
        h = ops.relu(h)
        h = Conv3D(self.features, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(name="bn2")(h, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = Conv3D(self.features, 1, stride=self.stride, padding=0,
                              use_bias=False, dtype=self.dtype, name="downsample")(residual)
            residual = BatchNorm(name="bn_down")(residual, use_running_average=not train)
        return ops.relu(h + residual)


class ResNet3D(fnn.Module):
    """resnet10-style 3D ResNet: stem conv7 s2 + maxpool, 4 stages of basic
    blocks, global average pool, linear head (MONAI ResNet semantics)."""

    block_counts: Sequence[int] = (1, 1, 1, 1)   # resnet10
    widths: Sequence[int] = (64, 128, 256, 512)
    num_classes: int = 1
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        # MONAI resnet10 defaults: conv1 out=block_inplanes[0], kernel 7³,
        # stride (conv1_t_stride=1, 2, 2)
        h = Conv3D(self.widths[0], 7, stride=(1, 2, 2), padding=3, use_bias=False,
                   dtype=self.dtype, name="stem")(x)
        h = BatchNorm(name="stem_bn")(h, use_running_average=not train)
        h = ops.relu(h)
        h = ops.max_pool3d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                                   constant_values=-jnp.inf), 3, 2)
        for stage, (n, w) in enumerate(zip(self.block_counts, self.widths)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                h = ResBlock3D(w, stride, dtype=self.dtype,
                               name=f"stage{stage}_block{i}")(h, train)
        h = jnp.mean(h, axis=(1, 2, 3))
        from dose_prediction_tpu.nn.layers import Dense
        return Dense(self.num_classes, dtype=self.dtype, name="fc")(h)


def resnet10(num_classes: int = 1, dtype=jnp.float32) -> ResNet3D:
    return ResNet3D(block_counts=(1, 1, 1, 1), num_classes=num_classes, dtype=dtype)


def vitgan_generator(small: bool = False, dtype=jnp.float32) -> VitGenerator:
    """The ViT-GAN generator exactly as the reference trains it
    (train_light_gan.py:124-133: MainSubsetModel(feature_size=16,
    num_layers=8, num_heads=6, mode_multi_dec=True, act='mish',
    multiS_conv=False)); ``small`` is the reduced dev/CI width."""
    if small:
        return VitGenerator(hidden_size=24, mlp_dim=48, num_layers=2,
                            num_heads=2, feature_size=2, mode_multi_dec=True,
                            act="mish", multiS_conv=False, dtype=dtype)
    return VitGenerator(num_layers=8, num_heads=6, mode_multi_dec=True,
                        act="mish", multiS_conv=False, dtype=dtype)


def exp_generator(small: bool = False, *, act: str = "mish",
                  multis_conv: bool = True, dtype=jnp.float32) -> VitGenerator:
    """The TestModel generator of train_light_exp_models.py:118-129 with the
    main()-block hyperparameters (:356-363: num_layers=8, num_heads=6,
    mode_multi_dec=True, multiS_conv=True, act from the command line);
    ``small`` is the reduced dev/CI width."""
    if small:
        return VitGenerator(hidden_size=24, mlp_dim=48, num_layers=2,
                            num_heads=2, feature_size=2, mode_multi_dec=True,
                            act=act, multiS_conv=multis_conv, dtype=dtype)
    return VitGenerator(num_layers=8, num_heads=6, mode_multi_dec=True,
                        act=act, multiS_conv=multis_conv, dtype=dtype)

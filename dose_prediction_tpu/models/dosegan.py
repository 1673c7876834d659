"""DoseGAN — pix2pix-style 3D GAN for dose prediction.

Parity target: DosePrediction/Models/Networks/dosegan.py — recursive U-Net
generator with attention-gated skips (UnetSkipConnectionBlock3d :115, AttGate
:88, note the *shared* initial_conv applied to both gate inputs), dilated k=4
"same-size" convs (k4 s1 p3 d2) at the outer stages, and a PatchGAN-style
NLayerDiscriminator (:177) built from attention BlockDiscriminators (:158).
Norm layer is BatchNorm3d throughout (running stats in `batch_stats`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax
import jax.numpy as jnp

from dose_prediction_tpu import ops
from dose_prediction_tpu.nn.layers import BatchNorm, Conv3D, ConvTranspose3D


class AttGate(fnn.Module):
    """Attention gate (dosegan.py:88): shared 1×1 conv on both inputs, add,
    ReLU→1×1→BN→sigmoid, multiply onto the first input."""

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


class UnetSkipBlock(fnn.Module):
    """One recursion level of the generator (dosegan.py:115-155). Output has
    2 × in_nc channels: cat(att_gate(z, x), z).

    Channel schedule from the reference construction (dosegan.py:63-74),
    outermost (depth 4) → innermost (depth 0):
    in_nc 64→128→256→512→512, down_nc 128→256→512→512→512 (capped at 8·ngf);
    the upconv input width is whatever the submodule emits (2·down_nc, or
    down_nc at the innermost level) and is inferred from the activations.
    """

    in_nc: int
    down_nc: int
    depth: int  # remaining inner levels (0 = innermost)
    max_nc: int = 512  # width cap = 8·ngf (dosegan.py:63-74 hardcodes ngf·8)
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        h = ops.leaky_relu(x, 0.2)
        # bias=use_bias is False under BatchNorm3d (dosegan.py:122-131)
        h = Conv3D(self.down_nc, 4, stride=2, padding=1, use_bias=False,
                   dtype=self.dtype, name="downconv")(h)
        if self.depth > 0:  # innermost level has no downnorm and no submodule
            h = BatchNorm(name="downnorm")(h, use_running_average=not train)
            h = UnetSkipBlock(self.down_nc, min(self.down_nc * 2, self.max_nc),
                              self.depth - 1, max_nc=self.max_nc,
                              dtype=self.dtype, name="submodule")(h, train)
        h = ops.relu(h)
        h = ConvTranspose3D(self.in_nc, 4, stride=2, padding=1, use_bias=False,
                            dtype=self.dtype, name="upconv")(h)
        z = BatchNorm(name="upnorm")(h, use_running_average=not train)
        att = AttGate(self.in_nc, dtype=self.dtype, name="att_gate")(z, x, train)
        return jnp.concatenate([att, z], axis=-1)


class UnetGenerator3D(fnn.Module):
    """Generator (dosegan.py:50-85): same-size dilated k4 stem, 5-level
    recursive attention U-Net, dilated k4 + tanh head."""

    out_ch: int = 1
    ngf: int = 64
    num_levels: int = 5
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        h = Conv3D(self.ngf, 4, stride=1, padding=3, dilation=2, dtype=self.dtype, name="initial_conv")(x)
        h = BatchNorm(name="initial_norm")(h, use_running_average=not train)
        h = ops.leaky_relu(h, 0.2)
        h = UnetSkipBlock(self.ngf, self.ngf * 2, self.num_levels - 1,
                          max_nc=self.ngf * 8, dtype=self.dtype, name="unet")(h, train)
        h = Conv3D(self.out_ch, 4, stride=1, padding=3, dilation=2, dtype=self.dtype, name="outer_conv")(h)
        return ops.tanh(h)


class BlockDiscriminator(fnn.Module):
    ndf: int
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True):
        z1 = Conv3D(self.ndf, 4, stride=2, padding=1, dtype=self.dtype, name="down_conv")(x)
        z1 = BatchNorm(name="down_norm")(z1, use_running_average=not train)
        z1 = ops.leaky_relu(z1, 0.2)
        z2 = Conv3D(self.ndf, 4, stride=1, padding=3, dilation=2, dtype=self.dtype, name="pool_conv")(z1)
        z2 = BatchNorm(name="pool_norm")(z2, use_running_average=not train)
        z2 = ops.leaky_relu(z2, 0.2)
        att = AttGate(self.ndf, dtype=self.dtype, name="att_gate")(z2, z1, train)
        return jnp.concatenate([att, z2], axis=-1)


class NLayerDiscriminator(fnn.Module):
    """PatchGAN discriminator (dosegan.py:177-215), default ndf=64, 3 layers."""

    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        h = Conv3D(self.ndf, 4, stride=1, padding=3, dilation=2, dtype=self.dtype, name="initial_conv")(x)
        h = BatchNorm(name="initial_norm")(h, use_running_average=not train)
        h = ops.leaky_relu(h, 0.2)
        for n in range(self.n_layers):
            h = BlockDiscriminator((2 ** n) * self.ndf, dtype=self.dtype, name=f"block{n}")(h, train)
        h = Conv3D(1, 4, stride=1, padding=3, dilation=2, dtype=self.dtype, name="final_conv")(h)
        h = BatchNorm(name="final_norm")(h, use_running_average=not train)
        h = ops.leaky_relu(h, 0.2)
        if self.use_sigmoid:
            h = ops.sigmoid(h)
        return h

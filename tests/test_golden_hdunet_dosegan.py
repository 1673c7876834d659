"""HD-UNet and DoseGAN torch→flax golden parity (core/torch_import.py).

Torch replicas with the reference key structures (hdunet.py:6-162,
dosegan.py:50-215) are built as golden sources; their state dicts import into
the flax models and eval-mode forwards must match — closing the checkpoint-
migration matrix for the last two reference model families."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.core import torch_import as TI


def test_hdunet_key_map():
    assert TI.hdunet_key_map("encoder.encoder_1.0.single_conv.0") == (
        "enc1_c1", "conv", "conv")
    assert TI.hdunet_key_map("encoder.encoder_1.1.single_conv.1") == (
        "enc1_c2", "conv", "norm")
    # encoder_L (L>=2) slot 0 is the DenseDownsample
    assert TI.hdunet_key_map("encoder.encoder_3.0.single_conv.0") == (
        "enc3_down", "conv", "conv")
    assert TI.hdunet_key_map("encoder.encoder_5.4.single_conv.0") == (
        "enc5_c4", "conv", "conv")
    assert TI.hdunet_key_map("decoder.upconv_4.conv.1") == (
        "upconv_4", "conv", "norm")
    assert TI.hdunet_key_map("decoder.decoder_conv_2.1.single_conv.0") == (
        "dec2_c2", "conv")
    assert TI.hdunet_key_map("decoder.final_conv") == ("final_conv",)
    # Model wrapper and Lightning prefixes strip (train_light_hdunet.py:68)
    assert TI.hdunet_key_map("model.encoder.encoder_1.0.single_conv.0") == (
        "enc1_c1", "conv", "conv")
    assert TI.hdunet_key_map("model_.model.decoder.final_conv") == ("final_conv",)
    assert TI.hdunet_key_map("something.else") is None


def test_dosegan_key_maps():
    g = TI.dosegan_g_key_map
    assert g("initial_block.0") == ("initial_conv",)
    assert g("initial_block.1") == ("initial_norm",)
    assert g("outer_block.0") == ("outer_conv",)
    assert g("model.model.1") == ("unet", "downconv")
    assert g("model.model.2") == ("unet", "downnorm")
    assert g("model.model.5") == ("unet", "upconv")
    assert g("model.model.6") == ("unet", "upnorm")
    assert g("model.model.3.model.1") == ("unet", "submodule", "downconv")
    # innermost (depth 4): shorter sequential → upconv at 3, upnorm at 4
    inner = "model" + ".model.3" * 4
    assert g(inner + ".model.3") == ("unet",) + ("submodule",) * 4 + ("upconv",)
    assert g(inner + ".model.4") == ("unet",) + ("submodule",) * 4 + ("upnorm",)
    assert g("model.att_gate.initial_conv") == ("unet", "att_gate", "initial_conv")
    assert g("model.model.3.att_gate.intermediate.1") == (
        "unet", "submodule", "att_gate", "inter_conv")
    assert g("model.model.3.att_gate.intermediate.2") == (
        "unet", "submodule", "att_gate", "inter_norm")
    # combined-checkpoint routing
    assert g("netG.initial_block.0") == ("initial_conv",)
    assert g("netD.model.1") is None
    assert TI.dosegan_g_transposed_key("model.model.5")
    assert not TI.dosegan_g_transposed_key("model.model.1")

    d = TI.dosegan_d_key_map
    assert d("model.0") == ("initial_conv",)
    assert d("model.1") == ("initial_norm",)
    assert d("model.3.downsample.0") == ("block0", "down_conv")
    assert d("model.4.pooling.1") == ("block1", "pool_norm")
    assert d("model.5.att_gate.intermediate.2") == ("block2", "att_gate", "inter_norm")
    assert d("model.6") == ("final_conv",)
    assert d("model.7") == ("final_norm",)
    assert d("netD.model.0") == ("initial_conv",)
    assert d("netG.model.0") is None


def _randomize_bn_stats(tmodel, seed=1):
    import torch

    gen = np.random.default_rng(seed)
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.BatchNorm3d):
            mod.running_mean.copy_(torch.from_numpy(
                gen.standard_normal(mod.num_features).astype(np.float32)))
            mod.running_var.copy_(torch.from_numpy(
                (0.5 + gen.random(mod.num_features)).astype(np.float32)))


def _torch_hdunet(in_ch=9, g=4, up=8):
    """Torch model with the reference hdunet.py key structure (the golden
    source for the importer, fixed decoder widths 256/128/64/32)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class TSingle(tnn.Module):
        def __init__(self, i, o, stride=1):
            super().__init__()
            self.single_conv = tnn.Sequential(
                tnn.Conv3d(i, o, 3, padding=1, stride=stride, bias=True),
                tnn.InstanceNorm3d(o, affine=True), tnn.ReLU())

        def forward(self, x):
            return self.single_conv(x)

    class TDenseConv(TSingle):
        def forward(self, x):
            return torch.cat((self.single_conv(x), x), 1)

    class TDenseDown(tnn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.single_conv = tnn.Sequential(
                tnn.Conv3d(i, o, 3, padding=1, stride=2, bias=True),
                tnn.InstanceNorm3d(o, affine=True), tnn.ReLU())
            self.pooling = tnn.MaxPool3d(2, 2)

        def forward(self, x):
            return torch.cat((self.single_conv(x), self.pooling(x)), 1)

    class TUp(tnn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.conv = tnn.Sequential(
                tnn.Conv3d(i, o, 3, padding=1, bias=True),
                tnn.InstanceNorm3d(o, affine=True), tnn.ReLU())

        def forward(self, x):
            return self.conv(F.interpolate(x, scale_factor=2, mode="trilinear",
                                           align_corners=True))

    class TEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_1 = tnn.Sequential(
                TDenseConv(in_ch, g), TDenseConv(in_ch + g, g))
            for lvl in (2, 3, 4):
                base = in_ch + (3 * lvl - 4) * g
                setattr(self, f"encoder_{lvl}", tnn.Sequential(
                    TDenseDown(base, g), TDenseConv(base + g, g),
                    TDenseConv(base + 2 * g, g)))
            self.encoder_5 = tnn.Sequential(
                TDenseDown(in_ch + 11 * g, g),
                *[TDenseConv(in_ch + (12 + k) * g, g) for k in range(4)])

        def forward(self, x):
            outs = []
            for lvl in range(1, 6):
                x = getattr(self, f"encoder_{lvl}")(x)
                outs.append(x)
            return outs

    class TDecoder(tnn.Module):
        def __init__(self):
            super().__init__()
            widths = {4: 256, 3: 128, 2: 64, 1: 32}
            skips = {4: in_ch + 11 * g, 3: in_ch + 8 * g,
                     2: in_ch + 5 * g, 1: in_ch + 2 * g}
            up_in = in_ch + 16 * g
            for lvl in (4, 3, 2, 1):
                setattr(self, f"upconv_{lvl}", TUp(up_in, up))
                setattr(self, f"decoder_conv_{lvl}", tnn.Sequential(
                    TSingle(skips[lvl] + up, widths[lvl]),
                    TSingle(widths[lvl], widths[lvl])))
                up_in = widths[lvl]
            self.final_conv = tnn.Conv3d(32, 1, 1, bias=True)

        def forward(self, outs):
            e1, e2, e3, e4, e5 = outs
            x = e5
            for lvl, skip in ((4, e4), (3, e3), (2, e2), (1, e1)):
                x = getattr(self, f"upconv_{lvl}")(x)
                x = getattr(self, f"decoder_conv_{lvl}")(torch.cat((x, skip), 1))
            return self.final_conv(x)

    class THDUNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TEncoder()
            self.decoder = TDecoder()

        def forward(self, x):
            return self.decoder(self.encoder(x))

    return THDUNet()


@pytest.mark.slow
def test_import_hdunet_golden_forward(tmp_path):
    """Import a torch HD-UNet (Lightning 'model_.model.' prefixes included)
    into HDUNet; forwards match."""
    import torch

    from dose_prediction_tpu.models import HDUNet

    torch.manual_seed(0)
    tmodel = _torch_hdunet().eval()
    # exercise the Lightning-checkpoint prefix path end-to-end
    sd = {f"model_.model.{k}": v for k, v in tmodel.state_dict().items()}
    pth = tmp_path / "hdunet.ckpt"
    torch.save({"state_dict": sd}, pth)

    model = HDUNet(growth_rate=4, upsample_chan=8)
    x = np.random.default_rng(0).standard_normal((1, 32, 32, 32, 9)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    imported, stats = TI.import_hdunet(str(pth), variables)
    assert stats["missing"] == 0
    assert stats["copied"] == stats["inside"]

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    jout = model.apply(imported, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jout)[0, ..., 0], tout.numpy()[0, 0],
                               rtol=1e-3, atol=1e-4)


def _torch_att_gate(c):
    import torch.nn as tnn

    class TAtt(tnn.Module):
        def __init__(self):
            super().__init__()
            self.initial_conv = tnn.Conv3d(c, c, 1)
            self.intermediate = tnn.Sequential(
                tnn.ReLU(), tnn.Conv3d(c, c, 1), tnn.BatchNorm3d(c), tnn.Sigmoid())

        def forward(self, down_inp, sample_inp):
            z1 = self.initial_conv(down_inp)
            z2 = self.initial_conv(sample_inp)
            return z1 * self.intermediate(z1 + z2)

    return TAtt()


def _torch_dosegan_g(ngf=4, in_ch=9, out_ch=1):
    """Torch generator with the reference's recursive anonymous-Sequential key
    structure (dosegan.py:50-155)."""
    import torch
    import torch.nn as tnn

    class TSkip(tnn.Module):
        def __init__(self, in_nc, down_nc, up_nc, submodule=None, innermost=False):
            super().__init__()
            downconv = tnn.Conv3d(in_nc, down_nc, 4, stride=2, padding=1, bias=False)
            downrelu = tnn.LeakyReLU(0.2)
            uprelu = tnn.ReLU()
            upconv = tnn.ConvTranspose3d(up_nc, in_nc, 4, stride=2, padding=1,
                                         bias=False)
            upnorm = tnn.BatchNorm3d(in_nc)
            if innermost:
                model = [downrelu, downconv, uprelu, upconv, upnorm]
            else:
                model = [downrelu, downconv, tnn.BatchNorm3d(down_nc),
                         submodule, uprelu, upconv, upnorm]
            self.model = tnn.Sequential(*model)
            self.att_gate = _torch_att_gate(in_nc)

        def forward(self, x):
            z = self.model(x)
            return torch.cat([self.att_gate(z, x), z], 1)

    class TG(tnn.Module):
        def __init__(self):
            super().__init__()
            n = ngf
            self.initial_block = tnn.Sequential(
                tnn.Conv3d(in_ch, n, 4, stride=1, padding=3, dilation=2),
                tnn.BatchNorm3d(n), tnn.LeakyReLU(0.2))
            blk = TSkip(8 * n, 8 * n, 8 * n, innermost=True)
            blk = TSkip(8 * n, 8 * n, 16 * n, submodule=blk)
            blk = TSkip(4 * n, 8 * n, 16 * n, submodule=blk)
            blk = TSkip(2 * n, 4 * n, 8 * n, submodule=blk)
            self.model = TSkip(n, 2 * n, 4 * n, submodule=blk)
            self.outer_block = tnn.Sequential(
                tnn.Conv3d(2 * n, out_ch, 4, stride=1, padding=3, dilation=2),
                tnn.Tanh())

        def forward(self, x):
            return self.outer_block(self.model(self.initial_block(x)))

    return TG()


def _torch_dosegan_d(ndf=4, in_ch=1):
    """Torch NLayerDiscriminator replica (dosegan.py:177-215, n_layers=3)."""
    import torch
    import torch.nn as tnn

    class TBlock(tnn.Module):
        def __init__(self, nc):
            super().__init__()
            self.downsample = tnn.Sequential(
                tnn.Conv3d(nc, nc, 4, stride=2, padding=1),
                tnn.BatchNorm3d(nc), tnn.LeakyReLU(0.2))
            self.pooling = tnn.Sequential(
                tnn.Conv3d(nc, nc, 4, stride=1, padding=3, dilation=2),
                tnn.BatchNorm3d(nc), tnn.LeakyReLU(0.2))
            self.att_gate = _torch_att_gate(nc)

        def forward(self, x):
            z1 = self.downsample(x)
            z2 = self.pooling(z1)
            return torch.cat([self.att_gate(z2, z1), z2], 1)

    class TD(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = tnn.Sequential(
                tnn.Conv3d(in_ch, ndf, 4, stride=1, padding=3, dilation=2),
                tnn.BatchNorm3d(ndf), tnn.LeakyReLU(0.2),
                TBlock(ndf), TBlock(2 * ndf), TBlock(4 * ndf),
                tnn.Conv3d(8 * ndf, 1, 4, stride=1, padding=3, dilation=2),
                tnn.BatchNorm3d(1), tnn.LeakyReLU(0.2))

        def forward(self, x):
            return self.model(x)

    return TD()


@pytest.mark.slow
def test_import_dosegan_generator_golden_forward():
    import torch

    from dose_prediction_tpu.models.dosegan import UnetGenerator3D

    torch.manual_seed(0)
    tmodel = _torch_dosegan_g().eval()
    _randomize_bn_stats(tmodel)
    # combined-GAN checkpoint prefix routing (netG.)
    sd = {f"netG.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = UnetGenerator3D(out_ch=1, ngf=4)
    x = np.random.default_rng(0).standard_normal((1, 32, 32, 32, 9)).astype(np.float32)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), jnp.asarray(x), False)

    imported, stats = TI.import_dosegan_g(sd, variables)
    assert stats["missing"] == 0
    assert stats["copied"] == stats["inside"]

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    jout = model.apply(imported, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jout)[0, ..., 0], tout.numpy()[0, 0],
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_import_dosegan_discriminator_golden_forward():
    import torch

    from dose_prediction_tpu.models.dosegan import NLayerDiscriminator

    torch.manual_seed(0)
    tmodel = _torch_dosegan_d().eval()
    _randomize_bn_stats(tmodel)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = NLayerDiscriminator(ndf=4)
    x = np.random.default_rng(0).standard_normal((1, 32, 32, 32, 1)).astype(np.float32)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), jnp.asarray(x), False)

    imported, stats = TI.import_dosegan_d(sd, variables)
    assert stats["missing"] == 0
    assert stats["copied"] == stats["inside"]

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    jout = model.apply(imported, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jout)[0, ..., 0], tout.numpy()[0, 0],
                               rtol=1e-3, atol=1e-4)

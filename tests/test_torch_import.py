"""Torch→flax checkpoint import tests (core/torch_import.py): tensor layout
conversion units + a full golden test importing a torch C3D cascade
(create_pretrained_unet source format, c3d.py:172-204) and matching forwards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.core import torch_import as TI


def test_convert_tensor_layouts():
    w5 = np.arange(2 * 3 * 1 * 1 * 1, dtype=np.float32).reshape(2, 3, 1, 1, 1)
    name, out = TI.convert_tensor("x.weight", w5)
    assert name == "kernel" and out.shape == (1, 1, 1, 3, 2)
    np.testing.assert_array_equal(out[0, 0, 0], w5[:, :, 0, 0, 0].T)

    w2 = np.arange(6, dtype=np.float32).reshape(2, 3)
    name, out = TI.convert_tensor("fc.weight", w2)
    assert name == "kernel" and out.shape == (3, 2)

    w1 = np.ones(4, np.float32)
    assert TI.convert_tensor("norm.weight", w1)[0] == "scale"
    assert TI.convert_tensor("norm.bias", w1)[0] == "bias"
    assert TI.convert_tensor("bn.running_mean", w1)[0] == "mean"
    assert TI.convert_tensor("bn.running_var", w1)[0] == "var"


def test_c3d_key_map():
    assert TI.c3d_key_map("net_A.encoder.encoder_1.0.single_conv.0") == (
        "net_A", "encoder", "encoder_1_conv1", "conv")
    assert TI.c3d_key_map("net_B.encoder.encoder_3.1.single_conv.1") == (
        "net_B", "encoder", "encoder_3_conv2", "norm")
    assert TI.c3d_key_map("net_A.decoder.decoder_conv_4.1.single_conv.0") == (
        "net_A", "decoder", "decoder_4_conv2", "conv")
    assert TI.c3d_key_map("net_A.decoder.upconv_2.conv.0") == (
        "net_A", "decoder", "upconv_2", "conv", "conv")
    assert TI.c3d_key_map("conv_out_A") == ("conv_out_A",)
    # bare BaseUNet checkpoints count as net_A
    assert TI.c3d_key_map("encoder.encoder_1.0.single_conv.0") == (
        "net_A", "encoder", "encoder_1_conv1", "conv")
    assert TI.c3d_key_map("something.else") is None


def _torch_cascade(list_ch, in_ch=9, out_ch=1):
    """A torch model with the reference c3d.py key structure (c3d.py:11-170)
    — built here as the golden source for the importer, NOT a reimplementation
    of the reference's behavior (init/forward details don't matter beyond
    producing comparable outputs)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class TSingleConv(tnn.Module):
        def __init__(self, i, o, s=1):
            super().__init__()
            self.single_conv = tnn.Sequential(
                tnn.Conv3d(i, o, 3, padding=1, stride=s, bias=True),
                tnn.InstanceNorm3d(o, affine=True),
                tnn.ReLU(inplace=True))

        def forward(self, x):
            return self.single_conv(x)

    class TUpConv(tnn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.conv = tnn.Sequential(
                tnn.Conv3d(i, o, 3, padding=1, bias=True),
                tnn.InstanceNorm3d(o, affine=True),
                tnn.ReLU(inplace=True))

        def forward(self, x):
            x = F.interpolate(x, scale_factor=2, mode="trilinear", align_corners=True)
            return self.conv(x)

    class TEncoder(tnn.Module):
        def __init__(self, i, ch):
            super().__init__()
            for level in range(1, 6):
                cin = i if level == 1 else ch[level - 1]
                s = 1 if level == 1 else 2
                setattr(self, f"encoder_{level}", tnn.Sequential(
                    TSingleConv(cin, ch[level], s), TSingleConv(ch[level], ch[level])))

        def forward(self, x):
            outs = []
            for level in range(1, 6):
                x = getattr(self, f"encoder_{level}")(x)
                outs.append(x)
            return outs

    class TDecoder(tnn.Module):
        def __init__(self, ch):
            super().__init__()
            for level in (4, 3, 2):
                setattr(self, f"upconv_{level}", TUpConv(ch[level + 1], ch[level]))
                setattr(self, f"decoder_conv_{level}", tnn.Sequential(
                    TSingleConv(2 * ch[level], ch[level]), TSingleConv(ch[level], ch[level])))
            self.upconv_1 = TUpConv(ch[2], ch[1])
            self.decoder_conv_1 = tnn.Sequential(TSingleConv(2 * ch[1], ch[1]))

        def forward(self, outs):
            e1, e2, e3, e4, e5 = outs
            x = e5
            for level, skip in ((4, e4), (3, e3), (2, e2)):
                x = getattr(self, f"upconv_{level}")(x)
                x = getattr(self, f"decoder_conv_{level}")(torch.cat((x, skip), dim=1))
            x = self.upconv_1(x)
            return self.decoder_conv_1(torch.cat((x, e1), dim=1))

    class TBaseUNet(tnn.Module):
        def __init__(self, i, ch):
            super().__init__()
            self.encoder = TEncoder(i, ch)
            self.decoder = TDecoder(ch)

        def forward(self, x):
            return self.decoder(self.encoder(x))

    class TCascade(tnn.Module):
        def __init__(self):
            super().__init__()
            self.net_A = TBaseUNet(in_ch, list_ch)
            self.net_B = TBaseUNet(in_ch + list_ch[1], list_ch)
            self.conv_out_A = tnn.Conv3d(list_ch[1], out_ch, 1, bias=True)
            self.conv_out_B = tnn.Conv3d(list_ch[1], out_ch, 1, bias=True)

        def forward(self, x):
            a = self.net_A(x)
            b = self.net_B(torch.cat((a, x), dim=1))
            return self.conv_out_A(a), self.conv_out_B(b)

    return TCascade()


@pytest.mark.slow
def test_import_c3d_cascade_golden_forward():
    """Import a torch cascade state dict into CascadeC3D; forwards match."""
    import torch

    from dose_prediction_tpu.models import CascadeC3D

    torch.manual_seed(0)
    list_ch = (-1, 2, 4, 8, 16, 32)
    tmodel = _torch_cascade(list_ch).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = CascadeC3D(out_ch=1, list_ch_A=list_ch, list_ch_B=list_ch)
    # 32³ so the level-5 feature map is 2³ (torch InstanceNorm refuses
    # single-voxel spatial extents)
    x = np.random.default_rng(0).standard_normal((1, 32, 32, 32, 9)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    params, stats = TI.import_c3d_cascade(sd, variables["params"])
    assert stats["missing"] == 0          # every flax leaf was covered
    assert stats["copied"] == stats["inside"]

    with torch.no_grad():
        ta, tb = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    ja, jb = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ja)[0, ..., 0],
                               ta.numpy()[0, 0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jb)[0, ..., 0],
                               tb.numpy()[0, 0], rtol=1e-3, atol=1e-4)


def test_resnet10_key_map():
    assert TI.resnet10_key_map("conv1") == ("stem",)
    assert TI.resnet10_key_map("bn1") == ("stem_bn",)
    assert TI.resnet10_key_map("layer1.0.conv1") == ("stage0_block0", "conv1")
    assert TI.resnet10_key_map("layer3.0.bn2") == ("stage2_block0", "bn2")
    assert TI.resnet10_key_map("layer4.0.downsample.0") == ("stage3_block0", "downsample")
    assert TI.resnet10_key_map("layer4.0.downsample.1") == ("stage3_block0", "bn_down")
    assert TI.resnet10_key_map("fc") == ("fc",)
    assert TI.resnet10_key_map("something.else") is None


def _torch_resnet10(widths, num_classes=1, in_ch=1):
    """A torch model with the MedicalNet/MONAI ResNet key structure
    (create_pretrained_medical_resnet source format,
    models_experiments.py:1555-1588 / monai resnet10 defaults) — the golden
    source for the importer."""
    import torch.nn as tnn

    class TBasicBlock(tnn.Module):
        def __init__(self, i, o, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv3d(i, o, 3, stride=stride, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm3d(o)
            self.conv2 = tnn.Conv3d(o, o, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm3d(o)
            self.relu = tnn.ReLU()
            self.downsample = None
            if stride != 1 or i != o:
                self.downsample = tnn.Sequential(
                    tnn.Conv3d(i, o, 1, stride=stride, bias=False), tnn.BatchNorm3d(o))

        def forward(self, x):
            res = x if self.downsample is None else self.downsample(x)
            h = self.relu(self.bn1(self.conv1(x)))
            return self.relu(self.bn2(self.conv2(h)) + res)

    class TResNet10(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv3d(in_ch, widths[0], 7, stride=(1, 2, 2),
                                    padding=3, bias=False)
            self.bn1 = tnn.BatchNorm3d(widths[0])
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool3d(3, stride=2, padding=1)
            self.layer1 = tnn.Sequential(TBasicBlock(widths[0], widths[0]))
            for s in (2, 3, 4):
                setattr(self, f"layer{s}", tnn.Sequential(
                    TBasicBlock(widths[s - 2], widths[s - 1], stride=2)))
            self.avgpool = tnn.AdaptiveAvgPool3d(1)
            self.fc = tnn.Linear(widths[3], num_classes)

        def forward(self, x):
            h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for s in (1, 2, 3, 4):
                h = getattr(self, f"layer{s}")(h)
            return self.fc(self.avgpool(h).flatten(1))

    return TResNet10()


@pytest.mark.slow
def test_import_resnet10_golden_forward():
    """Import a MedicalNet-format torch resnet10 state dict into ResNet3D
    (the VitGAN pretrained-critic path, train_light_gan.py:124-138); eval-mode
    forwards match, including BatchNorm running stats."""
    import torch

    from dose_prediction_tpu.models.experiments import ResNet3D

    torch.manual_seed(0)
    widths = (4, 8, 16, 32)
    tmodel = _torch_resnet10(widths).eval()
    # non-trivial running stats so the batch_stats import is actually tested
    gen = np.random.default_rng(1)
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.BatchNorm3d):
            mod.running_mean.copy_(torch.from_numpy(
                gen.standard_normal(mod.num_features).astype(np.float32)))
            mod.running_var.copy_(torch.from_numpy(
                (0.5 + gen.random(mod.num_features)).astype(np.float32)))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = ResNet3D(widths=widths)
    x = np.random.default_rng(0).standard_normal((2, 8, 16, 16, 1)).astype(np.float32)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), jnp.asarray(x), False)

    imported, stats = TI.import_resnet10(sd, variables)
    assert stats["missing"] == 0
    assert stats["copied"] == stats["inside"]

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    jout = model.apply(imported, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), rtol=1e-3, atol=1e-4)


def test_load_torch_checkpoint_formats(tmp_path):
    import torch

    sd = {"conv_out_A.weight": torch.ones(1, 2, 1, 1, 1),
          "conv_out_A.bias": torch.zeros(1)}
    # NetworkTrainer pickle format with DataParallel prefixes
    torch.save({"network_state_dict": {f"module.{k}": v for k, v in sd.items()}},
               tmp_path / "net.pkl")
    out = TI.load_torch_checkpoint(str(tmp_path / "net.pkl"))
    assert set(out) == {"conv_out_A.weight", "conv_out_A.bias"}
    assert isinstance(out["conv_out_A.weight"], np.ndarray)

"""OAR-TranSeg cross-framework golden parity.

A reduced-size torch replica of the reference seg model family — monai ViT +
UnetrBasicBlock/UnetrPrUpBlock encoders, ModifiedUnetrUpBlock decoders, 1×1
ModifiedUnetOutBlock (oar_transeg.py:14-185) — is built with the reference's
exact module names, its weights are imported via core.torch_import.
import_transeg, and we assert forward parity ≤1e-3 plus DiceCE-gradient
parity on one training step. Three decoder flavors are covered:

1. block_family='seg', multiS_conv=True — the Models/ conv_3_1 decoders
   (base_blocks.py:91-141, blocks_MDUNet.py:132-157);
2. block_family='old', multiS_conv=True — the OldModels TRANSEG flavor the
   reference trainer actually imports for mode_model=1
   (train_light_transeg.py:20; BatchNorm conv blocks, bare 1×1 fuse —
   OldModels/Nets/blocks_MDUNet.py:132-148);
3. block_family='seg', multiS_conv=False — DualDilatedBlock decoders
   (blocks_MDUNet.py:194-215).

Shares the torch building blocks with test_golden_pyfer (same monai-0.7
semantics); Lightning '_model.' prefix stripping (the reference's checkpoint
surgery, train_light_transeg.py:126-146) is asserted too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.core import torch_import as TI

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import test_golden_pyfer as TG  # torch replicas of the shared monai blocks

IN_CH, OUT_CH = 1, 5
FS, HIDDEN, MLP, LAYERS, HEADS = 2, 24, 48, 4, 2
SIZE, PATCH = 32, 16


class _OutBlock(tnn.Module):
    """ModifiedUnetOutBlock (base_blocks.py:144-165): monai Convolution
    holding one 'conv' → torch key out.conv.conv."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TG._ConvOnly(cin, cout, 1, bias=True)

    def forward(self, x):
        return self.conv(x)


class _old_conv_block(tnn.Module):
    """OldModels/dose conv_block_3/_7 (BatchNorm3d + ReLU inner, any k)."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv3d(cin, cout, k, 1, (k - 1) // 2, bias=True),
            tnn.BatchNorm3d(cout), tnn.ReLU(inplace=True),
            tnn.Conv3d(cout, cout, k, 1, (k - 1) // 2, bias=True),
            tnn.BatchNorm3d(cout), tnn.ReLU(inplace=True))

    def forward(self, x):
        return self.conv(x)


class _old_conv_3_1(tnn.Module):
    """OldModels conv_3_1 (blocks_MDUNet.py:132-148): bare branches, bare
    1×1 fuse, no act knob."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv_3 = _old_conv_block(cin, cout, 3)
        self.conv_7 = _old_conv_block(cin, cout, 7)
        self.conv = tnn.Conv3d(cout * 2, cout, 1, 1, 0, bias=True)

    def forward(self, x):
        return self.conv(torch.cat((self.conv_3(x), self.conv_7(x)), dim=1))


class _seg_dilated_block(tnn.Module):
    """seg dilated_conv_block_5/_7 (blocks_MDUNet.py:160-192): k3 dilated,
    InstanceNorm + act inner."""

    def __init__(self, cin, cout, dilation, act):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv3d(cin, cout, 3, 1, dilation, dilation=dilation, bias=True),
            tnn.InstanceNorm3d(cout), TG._act_layer(act),
            tnn.Conv3d(cout, cout, 3, 1, dilation, dilation=dilation, bias=True),
            tnn.InstanceNorm3d(cout), TG._act_layer(act))

    def forward(self, x):
        return self.conv(x)


class _DualDilatedBlock(tnn.Module):
    """seg DualDilatedBlock (blocks_MDUNet.py:194-215): k3 ‖ dil-2 ‖ dil-3
    bare branches → 1×1 fuse + IN + act."""

    def __init__(self, cin, cout, act):
        super().__init__()
        self.conv_3 = TG._conv_block_3(cin, cout, act)
        self.conv_5 = _seg_dilated_block(cin, cout, 2, act)
        self.conv_7 = _seg_dilated_block(cin, cout, 3, act)
        self.conv = tnn.Sequential(tnn.Conv3d(cout * 3, cout, 1, 1, 0, bias=True),
                                   tnn.InstanceNorm3d(cout), TG._act_layer(act))

    def forward(self, x):
        x3, x5, x7 = self.conv_3(x), self.conv_5(x), self.conv_7(x)
        return self.conv(torch.cat((x3, x5, x7), dim=1))


class _MultiUnetBasicBlock(tnn.Module):
    def __init__(self, cin, cout, act, flavor):
        super().__init__()
        if flavor == "seg":
            self.cov_ = TG._conv_3_1(cin, cout, act)
        elif flavor == "old":
            self.cov_ = _old_conv_3_1(cin, cout)
        else:  # dual-dilated (multiS_conv=False)
            self.cov_ = _DualDilatedBlock(cin, cout, act)

    def forward(self, x):
        return self.cov_(x)


class _ModifiedUnetrUpBlock(tnn.Module):
    def __init__(self, cin, cout, act, flavor):
        super().__init__()
        self.transp_conv = TG._ConvOnly(cin, cout, 2, 2, transposed=True)
        self.conv_block = _MultiUnetBasicBlock(2 * cout, cout, act, flavor)

    def forward(self, inp, skip):
        return self.conv_block(torch.cat((self.transp_conv(inp), skip), dim=1))


class _TranSeg(tnn.Module):
    """Reference oar_transeg.py Model (:14-185) at reduced size, generalized
    to LAYERS taps at num_layers//4 multiples (fixed 3/6/9 for 12 layers)."""

    def __init__(self, flavor="seg"):
        super().__init__()
        self.feat_size = (SIZE // PATCH,) * 3
        self.vit = TG._ViT(IN_CH, SIZE, PATCH, HIDDEN, MLP, LAYERS, HEADS)
        self.encoder1 = TG._UnetrBasicBlock(IN_CH, FS)
        self.encoder2 = TG._UnetrPrUpBlock(HIDDEN, FS * 2, 2)
        self.encoder3 = TG._UnetrPrUpBlock(HIDDEN, FS * 4, 1)
        self.encoder4 = TG._UnetrPrUpBlock(HIDDEN, FS * 8, 0)
        self.decoder5 = _ModifiedUnetrUpBlock(HIDDEN, FS * 8, "relu", flavor)
        self.decoder4 = _ModifiedUnetrUpBlock(FS * 8, FS * 4, "relu", flavor)
        self.decoder3 = _ModifiedUnetrUpBlock(FS * 4, FS * 2, "relu", flavor)
        self.decoder2 = _ModifiedUnetrUpBlock(FS * 2, FS, "relu", flavor)
        self.out = _OutBlock(FS, OUT_CH)

    def proj_feat(self, x):
        x = x.view([x.size(0)] + list(self.feat_size) + [HIDDEN])
        return x.permute(0, 4, 1, 2, 3).contiguous()

    def forward(self, x_in):
        i = LAYERS // 4
        z, hidden = self.vit(x_in)
        enc1 = self.encoder1(x_in)
        enc2 = self.encoder2(self.proj_feat(hidden[i]))
        enc3 = self.encoder3(self.proj_feat(hidden[i * 2]))
        enc4 = self.encoder4(self.proj_feat(hidden[i * 3]))
        dec3 = self.decoder5(self.proj_feat(z), enc4)
        dec2 = self.decoder4(dec3, enc3)
        dec1 = self.decoder3(dec2, enc2)
        return self.out(self.decoder2(dec1, enc1))


def _randomize_batch_stats(tmodel, seed=0):
    torch.manual_seed(seed + 7)
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.3)


def _build_pair(block_family="seg", multiS_conv=True, seed=0, prefix=""):
    """(torch model, flax model, imported variables, merge stats, input)."""
    from dose_prediction_tpu.models import TranSeg

    flavor = {("seg", True): "seg", ("old", True): "old",
              ("seg", False): "dual"}[(block_family, multiS_conv)]
    torch.manual_seed(seed)
    tmodel = _TranSeg(flavor)
    _randomize_batch_stats(tmodel, seed)

    model = TranSeg(out_ch=OUT_CH, feature_size=FS, hidden_size=HIDDEN,
                    mlp_dim=MLP, num_layers=LAYERS, num_heads=HEADS,
                    block_family=block_family, multiS_conv=multiS_conv)
    x = np.random.default_rng(seed).standard_normal(
        (1, SIZE, SIZE, SIZE, IN_CH)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {prefix + k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    imported, stats = TI.import_transeg(sd, variables, verbose=False)
    return tmodel, model, imported, stats, x


def _assert_forward_parity(tmodel, model, imported, x):
    tmodel.eval()
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    jout = model.apply(imported, jnp.asarray(x), train=False)
    # atol 3e-4: near-zero logits accumulate ~1e-4 of reduction-order float
    # noise through the deep f32 chain; semantic drift shows as O(1) errors
    np.testing.assert_allclose(np.asarray(jout)[0].transpose(3, 0, 1, 2),
                               tout.numpy()[0], rtol=1e-3, atol=3e-4)


@pytest.mark.slow
def test_transeg_import_covers_every_leaf():
    _, _, _, stats, _ = _build_pair()
    assert stats["missing"] == 0, "some flax param leaves were not imported"
    assert stats["copied"] == stats["inside"]


@pytest.mark.slow
def test_transeg_lightning_prefix_stripped():
    """'_model.'-prefixed Lightning keys import identically
    (train_light_transeg.py:126-146 surgery semantics)."""
    _, _, imported, stats, _ = _build_pair(prefix="_model.")
    assert stats["missing"] == 0 and stats["copied"] == stats["inside"]
    leaf = imported["params"]["out"]["conv"]["kernel"]
    assert np.asarray(leaf).shape == (1, 1, 1, FS, OUT_CH)


@pytest.mark.slow
def test_transeg_golden_forward_parity():
    tmodel, model, imported, stats, x = _build_pair()
    assert stats["missing"] == 0
    _assert_forward_parity(tmodel, model, imported, x)


@pytest.mark.slow
def test_transeg_old_family_forward_parity():
    """OldModels TRANSEG flavor — what mode_model=1 (and the linked cascade)
    actually loads (train_light_transeg.py:20)."""
    tmodel, model, imported, stats, x = _build_pair(block_family="old", seed=2)
    assert stats["missing"] == 0
    _assert_forward_parity(tmodel, model, imported, x)


@pytest.mark.slow
def test_transeg_dual_dilated_forward_parity():
    """multiS_conv=False decoders (DualDilatedBlock, blocks_MDUNet.py:194)."""
    tmodel, model, imported, stats, x = _build_pair(multiS_conv=False, seed=3)
    assert stats["missing"] == 0
    _assert_forward_parity(tmodel, model, imported, x)


def _torch_dice_ce(logits, labels):
    """MONAI DiceCELoss(to_onehot_y=True, softmax=True) — mirrors
    train/losses.py dice_ce_loss for the parity check."""
    import torch.nn.functional as F

    probs = torch.softmax(logits, dim=1)
    onehot = F.one_hot(labels, OUT_CH).permute(0, 4, 1, 2, 3).float()
    inter = (probs * onehot).sum(dim=(2, 3, 4))
    denom = probs.sum(dim=(2, 3, 4)) + onehot.sum(dim=(2, 3, 4))
    dice = 1.0 - (2.0 * inter + 1e-5) / (denom + 1e-5)
    return dice.mean() + F.cross_entropy(logits, labels)


@pytest.mark.slow
def test_transeg_golden_gradient_parity():
    """One DiceCE train step (train_light_transeg.py:193-198): d loss / d θ
    matches leaf-for-leaf (BatchNorm in batch-stats mode on both sides)."""
    from dose_prediction_tpu.train import losses as L

    tmodel, model, imported, _, x = _build_pair(seed=1)
    labels = np.random.default_rng(1).integers(
        0, OUT_CH, size=(1, SIZE, SIZE, SIZE)).astype(np.int32)

    tmodel.train()
    tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    tloss = _torch_dice_ce(tmodel(tx), torch.from_numpy(labels).long())
    tloss.backward()
    grads_sd = {k: p.grad.numpy() for k, p in tmodel.named_parameters()
                if p.grad is not None}
    tgrad_tree, _ = TI.split_batch_stats(TI.state_dict_to_tree(
        grads_sd, TI.transeg_key_map, transposed=TI.pyfer_transposed_key))

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": imported["batch_stats"]},
            jnp.asarray(x), train=True, mutable=["batch_stats"])
        return L.dice_ce_loss(logits, jnp.asarray(labels))

    jloss, jgrads = jax.value_and_grad(loss_fn)(imported["params"])
    np.testing.assert_allclose(float(jloss), float(tloss.detach()), rtol=1e-4)

    checked = [0]

    def compare(tnode, jnode, path):
        for k, v in tnode.items():
            assert k in jnode, f"missing grad leaf {path + (k,)}"
            if isinstance(v, dict):
                compare(v, jnode[k], path + (k,))
            else:
                # per-leaf relative L2 (see test_golden_pyfer for rationale)
                j = np.asarray(jnode[k], np.float64)
                t = np.asarray(v, np.float64)
                if max(np.linalg.norm(t), np.linalg.norm(j)) < 1e-4:
                    checked[0] += 1
                    continue
                rel = np.linalg.norm(j - t) / (np.linalg.norm(t) + 1e-12)
                assert rel < 2e-3, (
                    f"grad mismatch at {'/'.join(path + (k,))}: rel L2 {rel:.2e}")
                checked[0] += 1

    compare(tgrad_tree, jgrads, ())
    assert checked[0] > 100


# ---------------------------------------------------------------------------
# plain MONAI UNETR (mode_model=0, train_light_transeg.py:93-107): res_block
# decoders (UnetResBlock conv stages — the monai UNETR is built with
# res_block=True, unlike every dose-side UnetrUpBlock usage)
# ---------------------------------------------------------------------------

class _UnetrUpBlockRes(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.transp_conv = TG._ConvOnly(cin, cout, 2, 2, transposed=True)
        self.conv_block = TG._UnetResBlock(2 * cout, cout)

    def forward(self, inp, skip):
        return self.conv_block(torch.cat((self.transp_conv(inp), skip), dim=1))


class _UNETR(tnn.Module):
    def __init__(self):
        super().__init__()
        self.feat_size = (SIZE // PATCH,) * 3
        self.vit = TG._ViT(IN_CH, SIZE, PATCH, HIDDEN, MLP, LAYERS, HEADS)
        self.encoder1 = TG._UnetrBasicBlock(IN_CH, FS)
        self.encoder2 = TG._UnetrPrUpBlock(HIDDEN, FS * 2, 2)
        self.encoder3 = TG._UnetrPrUpBlock(HIDDEN, FS * 4, 1)
        self.encoder4 = TG._UnetrPrUpBlock(HIDDEN, FS * 8, 0)
        self.decoder5 = _UnetrUpBlockRes(HIDDEN, FS * 8)
        self.decoder4 = _UnetrUpBlockRes(FS * 8, FS * 4)
        self.decoder3 = _UnetrUpBlockRes(FS * 4, FS * 2)
        self.decoder2 = _UnetrUpBlockRes(FS * 2, FS)
        self.out = _OutBlock(FS, OUT_CH)

    def proj_feat(self, x):
        x = x.view([x.size(0)] + list(self.feat_size) + [HIDDEN])
        return x.permute(0, 4, 1, 2, 3).contiguous()

    def forward(self, x_in):
        i = LAYERS // 4
        z, hidden = self.vit(x_in)
        enc1 = self.encoder1(x_in)
        enc2 = self.encoder2(self.proj_feat(hidden[i]))
        enc3 = self.encoder3(self.proj_feat(hidden[i * 2]))
        enc4 = self.encoder4(self.proj_feat(hidden[i * 3]))
        dec3 = self.decoder5(self.proj_feat(z), enc4)
        dec2 = self.decoder4(dec3, enc3)
        dec1 = self.decoder3(dec2, enc2)
        return self.out(self.decoder2(dec1, enc1))


@pytest.mark.slow
def test_unetr_golden_forward_parity():
    from dose_prediction_tpu.models import UNETR

    torch.manual_seed(4)
    tmodel = _UNETR()
    model = UNETR(out_ch=OUT_CH, feature_size=FS, hidden_size=HIDDEN,
                  mlp_dim=MLP, num_layers=LAYERS, num_heads=HEADS)
    x = np.random.default_rng(4).standard_normal(
        (1, SIZE, SIZE, SIZE, IN_CH)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    imported, stats = TI.import_unetr(sd, variables, verbose=False)
    assert stats["missing"] == 0, "some flax param leaves were not imported"
    assert stats["copied"] == stats["inside"]
    _assert_forward_parity(tmodel, model, imported, x)

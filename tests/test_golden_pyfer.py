"""Flagship cross-framework golden parity (VERDICT r3 next-round #2).

A reduced-size torch replica of the FULL reference DOSE-PYFER — monai-0.7 ViT
(PatchEmbeddingBlock perceptron / SABlock / MLPBlock / pre-norm
TransformerBlock), UnetrBasicBlock skip1 + UnetrPrUpBlock skips 2-4
(dose_pyfer.py:69-113), ModifiedUnetrUpBlock decoders with seg-family conv_3_1
internals (base_blocks.py:91-141, blocks_MDUNet.py:64-157), dose convertors
(:297-305) and the C3D net_A cascade (:325-360) — is built with the
reference's exact module names, its weights are imported via
core.torch_import.import_pyfer, and we assert:

1. forward parity ≤1e-3 on every cascade output (all 4 deep-supervision
   scales + the net_A head);
2. GenLoss (loss.py:50-119) gradient parity on one frozen-net_A train step,
   leaf by leaf across the whole imported tree.

This catches any block-semantics drift (norm placement, activation choice,
attention layout, transp-conv orientation, loss masking) that shape/unit
tests cannot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.core import torch_import as TI

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from einops.layers.torch import Rearrange  # noqa: E402  (reference dep, einops==0.6.1)

import test_torch_import as TT  # the C3D torch replica (net_A source)

# reduced flagship config: same topology, smaller widths
IN_CH, OUT_CH = 9, 1
LIST_CH = (-1, 2, 4, 8, 16, 32)
FS, HIDDEN, MLP, LAYERS, HEADS = 2, 24, 48, 4, 2
SIZE, PATCH = 32, 16


# ---------------------------------------------------------------------------
# torch replica — reference module names throughout (so pyfer_key_map works on
# real reference checkpoints too)
# ---------------------------------------------------------------------------

class _ConvOnly(tnn.Sequential):
    """monai Convolution(conv_only=True): a Sequential holding one 'conv'."""

    def __init__(self, cin, cout, k, s=1, p=None, bias=False, transposed=False):
        super().__init__()
        if transposed:
            conv = tnn.ConvTranspose3d(cin, cout, k, stride=s, bias=bias)
        else:
            conv = tnn.Conv3d(cin, cout, k, stride=s,
                              padding=(k - 1) // 2 if p is None else p, bias=bias)
        self.add_module("conv", conv)


class _UnetResBlock(tnn.Module):
    """monai dynunet UnetResBlock (conv1/norm1/conv2/norm2/lrelu, optional
    conv3/norm3 downsample; InstanceNorm affine=True via get_norm_layer)."""

    def __init__(self, cin, cout, k=3):
        super().__init__()
        self.conv1 = _ConvOnly(cin, cout, k)
        self.conv2 = _ConvOnly(cout, cout, k)
        self.lrelu = tnn.LeakyReLU(0.01, inplace=True)
        self.norm1 = tnn.InstanceNorm3d(cout, affine=True)
        self.norm2 = tnn.InstanceNorm3d(cout, affine=True)
        if cin != cout:
            self.conv3 = _ConvOnly(cin, cout, 1)
            self.norm3 = tnn.InstanceNorm3d(cout, affine=True)

    def forward(self, inp):
        residual = inp
        out = self.lrelu(self.norm1(self.conv1(inp)))
        out = self.norm2(self.conv2(out))
        if hasattr(self, "conv3"):
            residual = self.norm3(self.conv3(residual))
        return self.lrelu(out + residual)


class _UnetrBasicBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.layer = _UnetResBlock(cin, cout)

    def forward(self, x):
        return self.layer(x)


class _UnetrPrUpBlock(tnn.Module):
    def __init__(self, cin, cout, num_layer):
        super().__init__()
        self.transp_conv_init = _ConvOnly(cin, cout, 2, 2, transposed=True)
        self.blocks = tnn.ModuleList([
            tnn.Sequential(_ConvOnly(cout, cout, 2, 2, transposed=True),
                           _UnetResBlock(cout, cout))
            for _ in range(num_layer)])

    def forward(self, x):
        x = self.transp_conv_init(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class _PatchEmbeddingBlock(tnn.Module):
    """monai perceptron patch embed: Rearrange to (p1 p2 p3 c) + Linear."""

    def __init__(self, in_ch, img, patch, hidden):
        super().__init__()
        g = img // patch
        self.patch_embeddings = tnn.Sequential(
            Rearrange("b c (h p1) (w p2) (d p3) -> b (h w d) (p1 p2 p3 c)",
                      p1=patch, p2=patch, p3=patch),
            tnn.Linear(in_ch * patch ** 3, hidden))
        self.position_embeddings = tnn.Parameter(torch.zeros(1, g ** 3, hidden))

    def forward(self, x):
        return self.patch_embeddings(x) + self.position_embeddings


class _SABlock(tnn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.out_proj = tnn.Linear(hidden, hidden)
        self.qkv = tnn.Linear(hidden, hidden * 3, bias=False)
        self.input_rearrange = Rearrange("b h (qkv l d) -> qkv b l h d", qkv=3, l=heads)
        self.out_rearrange = Rearrange("b h l d -> b l (h d)")
        self.scale = (hidden // heads) ** -0.5

    def forward(self, x):
        output = self.input_rearrange(self.qkv(x))
        q, k, v = output[0], output[1], output[2]
        att = (torch.einsum("blxd,blyd->blxy", q, k) * self.scale).softmax(dim=-1)
        x = torch.einsum("bhxy,bhyd->bhxd", att, v)
        return self.out_proj(self.out_rearrange(x))


class _MLPBlock(tnn.Module):
    def __init__(self, hidden, mlp):
        super().__init__()
        self.linear1 = tnn.Linear(hidden, mlp)
        self.linear2 = tnn.Linear(mlp, hidden)
        self.fn = tnn.GELU()

    def forward(self, x):
        return self.linear2(self.fn(self.linear1(x)))


class _TransformerBlock(tnn.Module):
    def __init__(self, hidden, mlp, heads):
        super().__init__()
        self.mlp = _MLPBlock(hidden, mlp)
        self.norm1 = tnn.LayerNorm(hidden)
        self.attn = _SABlock(hidden, heads)
        self.norm2 = tnn.LayerNorm(hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class _ViT(tnn.Module):
    def __init__(self, in_ch, img, patch, hidden, mlp, layers, heads):
        super().__init__()
        self.patch_embedding = _PatchEmbeddingBlock(in_ch, img, patch, hidden)
        self.blocks = tnn.ModuleList(
            [_TransformerBlock(hidden, mlp, heads) for _ in range(layers)])
        self.norm = tnn.LayerNorm(hidden)

    def forward(self, x):
        x = self.patch_embedding(x)
        hidden_states_out = []
        for blk in self.blocks:
            x = blk(x)
            hidden_states_out.append(x)
        return self.norm(x), hidden_states_out


def _act_layer(act):
    return tnn.ReLU(inplace=True) if act == "relu" else tnn.Mish(inplace=True)


class _conv_block_3(tnn.Module):
    """seg blocks_MDUNet conv_block_3 (:64-78): IN(affine=False) + act inner."""

    def __init__(self, cin, cout, act="relu"):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv3d(cin, cout, 3, 1, 1, bias=True), tnn.InstanceNorm3d(cout),
            _act_layer(act),
            tnn.Conv3d(cout, cout, 3, 1, 1, bias=True), tnn.InstanceNorm3d(cout),
            _act_layer(act))

    def forward(self, x):
        return self.conv(x)


class _conv_block_7(tnn.Module):
    """seg conv_block_7 (:100-112): BatchNorm3d + ReLU inner."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv3d(cin, cout, 7, 1, 3, bias=True), tnn.BatchNorm3d(cout),
            tnn.ReLU(inplace=True),
            tnn.Conv3d(cout, cout, 7, 1, 3, bias=True), tnn.BatchNorm3d(cout),
            tnn.ReLU(inplace=True))

    def forward(self, x):
        return self.conv(x)


class _conv_3_1(tnn.Module):
    """seg conv_3_1 (:132-157). Quirk preserved: conv_block_3 built WITHOUT
    the act argument (inner relu regardless of outer act)."""

    def __init__(self, cin, cout, act):
        super().__init__()
        self.conv_3 = tnn.Sequential(_conv_block_3(cin, cout),
                                     tnn.InstanceNorm3d(cout), _act_layer(act))
        self.conv_7 = tnn.Sequential(_conv_block_7(cin, cout),
                                     tnn.InstanceNorm3d(cout), _act_layer(act))
        self.conv = tnn.Sequential(tnn.Conv3d(cout * 2, cout, 1, 1, 0, bias=True),
                                   tnn.InstanceNorm3d(cout), _act_layer(act))

    def forward(self, x):
        return self.conv(torch.cat((self.conv_3(x), self.conv_7(x)), dim=1))


class _MultiUnetBasicBlock(tnn.Module):
    def __init__(self, cin, cout, act):
        super().__init__()
        self.cov_ = _conv_3_1(cin, cout, act)

    def forward(self, x):
        return self.cov_(x)


class _ModifiedUnetrUpBlock(tnn.Module):
    def __init__(self, cin, cout, act):
        super().__init__()
        self.transp_conv = _ConvOnly(cin, cout, 2, 2, transposed=True)
        self.conv_block = _MultiUnetBasicBlock(2 * cout, cout, act)

    def forward(self, inp, skip):
        out = self.transp_conv(inp)
        return self.conv_block(torch.cat((out, skip), dim=1))


class _ViTEncoder(tnn.Module):
    def __init__(self, in_ch, img, fs, hidden, mlp, layers, heads):
        super().__init__()
        self.num_layers = layers
        self.feat_size = (img // PATCH,) * 3
        self.hidden_size = hidden
        self.vit = _ViT(in_ch, img, PATCH, hidden, mlp, layers, heads)
        self.skip1 = _UnetrBasicBlock(in_ch, fs)
        self.skip2 = _UnetrPrUpBlock(hidden, fs * 2, 2)
        self.skip3 = _UnetrPrUpBlock(hidden, fs * 4, 1)
        self.skip4 = _UnetrPrUpBlock(hidden, fs * 8, 0)

    def proj_feat(self, x):
        x = x.view([x.size(0)] + list(self.feat_size) + [self.hidden_size])
        return x.permute(0, 4, 1, 2, 3).contiguous()

    def forward(self, x_in):
        i = self.num_layers // 4
        z_final, hidden = self.vit(x_in)
        return [self.skip1(x_in),
                self.skip2(self.proj_feat(hidden[i])),
                self.skip3(self.proj_feat(hidden[i * 2])),
                self.skip4(self.proj_feat(hidden[i * 3])),
                self.proj_feat(z_final)]


class _PyMSCDecoder(tnn.Module):
    def __init__(self, fs, hidden, act):
        super().__init__()
        self.decoder4 = _ModifiedUnetrUpBlock(hidden, fs * 8, act)
        self.decoder3 = _ModifiedUnetrUpBlock(fs * 8, fs * 4, act)
        self.decoder2 = _ModifiedUnetrUpBlock(fs * 4, fs * 2, act)
        self.decoder1 = _ModifiedUnetrUpBlock(fs * 2, fs, act)

    def forward(self, enc):
        e1, e2, e3, e4, e5 = enc
        dec4 = self.decoder4(e5, e4)
        dec3 = self.decoder3(dec4, e3)
        dec2 = self.decoder2(dec3, e2)
        dec1 = self.decoder1(dec2, e1)
        return [dec1, dec2, dec3, dec4]


class _MainSubsetModel(tnn.Module):
    def __init__(self, in_ch, out_ch, img, fs, hidden, mlp, layers, heads, act):
        super().__init__()
        self.encoder = _ViTEncoder(in_ch, img, fs, hidden, mlp, layers, heads)
        self.decoder = _PyMSCDecoder(fs, hidden, act)
        self.dose_convertors = tnn.ModuleList(
            [tnn.Sequential(tnn.Conv3d(fs * 2 ** i, out_ch, 1, bias=True))
             for i in range(4)])
        self.out = tnn.Sequential(tnn.Conv3d(fs, out_ch, 1, bias=True))  # unused

    def forward(self, x):
        decs = self.decoder(self.encoder(x))
        return [conv(dec) for dec, conv in zip(decs, self.dose_convertors)]


class _Model(tnn.Module):
    """dose_pyfer.py Model (:325-360) with c3d-named net_A."""

    def __init__(self):
        super().__init__()
        self.net_A = TT._torch_cascade(LIST_CH, in_ch=IN_CH).net_A
        self.net_B = _MainSubsetModel(IN_CH + LIST_CH[1], OUT_CH, SIZE, FS,
                                      HIDDEN, MLP, LAYERS, HEADS, act="mish")
        self.conv_out_A = tnn.Conv3d(LIST_CH[1], OUT_CH, 1, bias=True)

    def forward(self, x):
        out_a = self.net_A(x)
        outs_b = self.net_B(torch.cat((out_a, x), dim=1))
        return self.conv_out_A(out_a), outs_b


def _torch_gen_loss(pred_a, preds_b, gt, delta1=10.0, delta2=8.0):
    """GenLoss train/cascade/freeze branch (loss.py:69-108)."""
    import torch.nn.functional as F

    gt_dose, mask = gt[:, 0:1], gt[:, 1:]
    l_ds = 0.0
    for i, p in enumerate(preds_b[1:]):
        dim = SIZE // 2 ** (i + 1)
        gt_i = F.interpolate(gt_dose, size=(dim,) * 3, mode="trilinear",
                             align_corners=True)
        m_i = F.interpolate(mask, size=(dim,) * 3, mode="nearest-exact")
        l_ds = l_ds + tnn.functional.l1_loss(p[m_i > 0], gt_i[m_i > 0])
    l_ds = l_ds / len(preds_b[1:])
    l_pre = tnn.functional.l1_loss(preds_b[0][mask > 0], gt_dose[mask > 0])
    return delta1 * l_pre + delta2 * l_ds


def _build_pair(seed=0):
    """(torch model, flax model+variables with imported weights, input)."""
    from dose_prediction_tpu.models import DosePyfer

    torch.manual_seed(seed)
    tmodel = _Model()
    # randomize the k7-branch BatchNorm running stats so eval parity actually
    # exercises the imported batch_stats
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.3)

    model = DosePyfer(out_ch=OUT_CH, list_ch_A=LIST_CH, feature_size=FS,
                      hidden_size=HIDDEN, mlp_dim=MLP, num_layers=LAYERS,
                      num_heads=HEADS)
    x = np.random.default_rng(seed).standard_normal(
        (1, SIZE, SIZE, SIZE, IN_CH)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    imported, stats = TI.import_pyfer(sd, variables, verbose=False)
    return tmodel, model, imported, stats, x


@pytest.mark.slow
def test_pyfer_import_covers_every_leaf():
    _, _, _, stats, _ = _build_pair()
    assert stats["missing"] == 0, "some flax param leaves were not imported"
    assert stats["copied"] == stats["inside"]


@pytest.mark.slow
def test_pyfer_golden_forward_parity():
    tmodel, model, imported, _, x = _build_pair()
    tmodel.eval()
    with torch.no_grad():
        ta, tbs = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    (ja, jbs), _ = model.apply(imported, jnp.asarray(x), train=False,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ja)[0, ..., 0], ta.numpy()[0, 0],
                               rtol=1e-3, atol=1e-4)
    assert len(jbs) == len(tbs) == 4
    for scale, (jb, tb) in enumerate(zip(jbs, tbs)):
        np.testing.assert_allclose(
            np.asarray(jb)[0, ..., 0], tb.numpy()[0, 0], rtol=1e-3, atol=1e-4,
            err_msg=f"deep-supervision scale {scale}")


@pytest.mark.slow
def test_pyfer_golden_gradient_parity():
    """One frozen-net_A GenLoss step: d loss / d θ matches leaf-for-leaf."""
    from dose_prediction_tpu.train import losses as L

    tmodel, model, imported, _, x = _build_pair(seed=1)
    rng = np.random.default_rng(1)
    dose = np.abs(rng.standard_normal((1, SIZE, SIZE, SIZE, 1))).astype(np.float32)
    mask = (rng.random((1, SIZE, SIZE, SIZE, 1)) > 0.4).astype(np.float32)
    gt = np.concatenate([dose, mask], axis=-1)

    # --- torch side: train mode, frozen net_A ---
    tmodel.train()
    for p in tmodel.net_A.parameters():
        p.requires_grad_(False)
    tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    tgt = torch.from_numpy(gt.transpose(0, 4, 1, 2, 3))
    ta, tbs = tmodel(tx)
    tloss = _torch_gen_loss(ta, tbs, tgt)
    tloss.backward()
    grads_sd = {k: p.grad.numpy() for k, p in tmodel.named_parameters()
                if p.grad is not None}
    tgrad_tree, _ = TI.split_batch_stats(TI.state_dict_to_tree(
        grads_sd, TI.pyfer_key_map, transposed=TI.pyfer_transposed_key))

    # --- jax side ---
    def loss_fn(params):
        (pa, pbs), _ = model.apply(
            {"params": params, "batch_stats": imported["batch_stats"]},
            jnp.asarray(x), train=True, stop_gradient_a=True,
            mutable=["batch_stats"])
        return L.gen_loss((pa, pbs), jnp.asarray(gt),
                          delta1=10.0, delta2=8.0, cascade=True, freeze=True)

    jloss, jgrads = jax.value_and_grad(loss_fn)(imported["params"])
    np.testing.assert_allclose(float(jloss), float(tloss), rtol=1e-4)

    # leaf-by-leaf comparison over the torch grads that exist
    checked = [0]

    def compare(tnode, jnode, path):
        for k, v in tnode.items():
            assert k in jnode, f"missing grad leaf {path + (k,)}"
            if isinstance(v, dict):
                compare(v, jnode[k], path + (k,))
            else:
                # per-leaf relative L2: elementwise tolerances are fragile on
                # near-zero entries after a deep f32 chain (different matmul
                # reduction orders); semantic drift shows as O(1) relative
                # error, observed float noise is ≤1e-3
                j = np.asarray(jnode[k], np.float64)
                t = np.asarray(v, np.float64)
                if max(np.linalg.norm(t), np.linalg.norm(j)) < 1e-4:
                    # exactly-zero true gradient (e.g. a conv bias absorbed by
                    # the following InstanceNorm's mean subtraction): both
                    # sides are float noise; require both to be tiny
                    checked[0] += 1
                    continue
                rel = np.linalg.norm(j - t) / (np.linalg.norm(t) + 1e-12)
                assert rel < 2e-3, (
                    f"grad mismatch at {'/'.join(path + (k,))}: rel L2 {rel:.2e}")
                checked[0] += 1

    compare(tgrad_tree, jgrads, ())
    assert checked[0] > 100   # the whole net_B + heads, not a token sample

"""Standalone ViT-generator (MainSubsetModel / VitGenerator) golden parity.

The exp-models TestModel (train_light_exp_models.py:118-129) and the ViT-GAN
generator (train_light_gan.py:124-133) both train a STANDALONE non-cascade
ViT generator — the net_B subtree of DOSE-PYFER without the cascade. Reduced
torch replicas (reference module names, reusing test_golden_pyfer /
test_golden_transeg blocks) are imported via core.torch_import.import_vitgen
and forward parity ≤1e-3 is asserted for both decoder flavors:

1. multiS_conv=True, act='mish' — the exp config (conv_3_1 decoders);
2. multiS_conv=False, act='mish' — the vitgan config (DualDilatedBlock
   decoders, blocks_MDUNet.py:194-215).

Lightning prefixes 'model_.' (exp holds self.model_) and 'generator.' (the
GAN module) are asserted to strip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.core import torch_import as TI

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import test_golden_pyfer as TP  # noqa: E402
import test_golden_transeg as TS  # noqa: E402

IN_CH, OUT_CH = 9, 1
FS, HIDDEN, MLP, LAYERS, HEADS = 2, 24, 48, 4, 2
SIZE = 32


def _torch_vitgen(multiS: bool, act: str = "mish", seed: int = 0):
    torch.manual_seed(seed)
    tmodel = TP._MainSubsetModel(IN_CH, OUT_CH, SIZE, FS, HIDDEN, MLP,
                                 LAYERS, HEADS, act=act)
    if not multiS:
        # swap each decoder stage's conv_block for the DualDilatedBlock
        # flavor (MultiUnetBasicBlock(multiS_conv=False), base_blocks.py:23)
        for name, cout in (("decoder4", FS * 8), ("decoder3", FS * 4),
                           ("decoder2", FS * 2), ("decoder1", FS)):
            dec = getattr(tmodel.decoder, name)
            dec.conv_block = TS._MultiUnetBasicBlock(2 * cout, cout, act,
                                                     flavor="dual")
    # randomize BatchNorm running stats (multiS conv_7 branches) so parity
    # exercises imported batch_stats
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm3d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.3)
    return tmodel


def _build_pair(multiS: bool, act: str = "mish", prefix: str = "", seed: int = 0):
    from dose_prediction_tpu.models.experiments import VitGenerator

    tmodel = _torch_vitgen(multiS, act, seed)
    model = VitGenerator(out_ch=OUT_CH, feature_size=FS, hidden_size=HIDDEN,
                         mlp_dim=MLP, num_layers=LAYERS, num_heads=HEADS,
                         mode_multi_dec=True, act=act, multiS_conv=multiS)
    x = np.random.default_rng(seed).standard_normal(
        (1, SIZE, SIZE, SIZE, IN_CH)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {prefix + k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    imported, stats = TI.import_vitgen(sd, variables, verbose=False)
    return tmodel, model, imported, stats, x


@pytest.mark.slow
@pytest.mark.parametrize("multiS,prefix", [(True, ""), (False, ""),
                                           (True, "model_."),
                                           (False, "generator.")])
def test_vitgen_import_covers_every_leaf(multiS, prefix):
    _, _, _, stats, _ = _build_pair(multiS, prefix=prefix)
    assert stats["missing"] == 0, "some flax leaves were not imported"
    assert stats["copied"] == stats["inside"]
    # the defined-but-unused `out` head maps to None in the key map, so it is
    # dropped before the merge — nothing else should be left over
    assert stats["unused"] == 0


@pytest.mark.slow
@pytest.mark.parametrize("multiS", [True, False])
def test_vitgen_golden_forward_parity(multiS):
    tmodel, model, imported, _, x = _build_pair(multiS)
    tmodel.eval()
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    jouts, _ = model.apply(imported, jnp.asarray(x), train=False,
                           mutable=["batch_stats"])
    assert len(jouts) == len(touts) == 4
    for scale, (jo, to) in enumerate(zip(jouts, touts)):
        np.testing.assert_allclose(
            np.asarray(jo)[0, ..., 0], to.numpy()[0, 0], rtol=1e-3, atol=1e-4,
            err_msg=f"deep-supervision scale {scale} (multiS={multiS})")


@pytest.mark.slow
def test_vitgen_golden_gradient_parity():
    """One non-cascade GenLoss step (the exp/vitgan recon loss,
    train_light_exp_models.py:163-171): d loss / d θ matches leaf-for-leaf."""
    from dose_prediction_tpu.train import losses as L

    tmodel, model, imported, _, x = _build_pair(multiS=True, seed=1)
    rng = np.random.default_rng(1)
    dose = np.abs(rng.standard_normal((1, SIZE, SIZE, SIZE, 1))).astype(np.float32)
    mask = (rng.random((1, SIZE, SIZE, SIZE, 1)) > 0.4).astype(np.float32)
    gt = np.concatenate([dose, mask], axis=-1)

    tmodel.train()
    tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    tgt = torch.from_numpy(gt.transpose(0, 4, 1, 2, 3))
    touts = tmodel(tx)
    # non-cascade GenLoss = δ1·l1(full) + δ2·mean(pyramid) — TP's torch
    # replica computes exactly that (the pred_a argument is unused)
    tloss = TP._torch_gen_loss(None, touts, tgt)
    tloss.backward()
    grads_sd = {k: p.grad.numpy() for k, p in tmodel.named_parameters()
                if p.grad is not None}
    tgrad_tree, _ = TI.split_batch_stats(TI.state_dict_to_tree(
        grads_sd, TI.vitgen_key_map, transposed=TI.pyfer_transposed_key))

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": imported["batch_stats"]},
            jnp.asarray(x), train=True, mutable=["batch_stats"])
        return L.gen_loss(preds, jnp.asarray(gt),
                          delta1=10.0, delta2=8.0, cascade=False)

    jloss, jgrads = jax.value_and_grad(loss_fn)(imported["params"])
    np.testing.assert_allclose(float(jloss), float(tloss), rtol=1e-4)

    checked = [0]

    def compare(tnode, jnode, path):
        for k, v in tnode.items():
            assert k in jnode, f"missing grad leaf {path + (k,)}"
            if isinstance(v, dict):
                compare(v, jnode[k], path + (k,))
            else:
                jv = np.asarray(jnode[k], np.float64)
                tv = np.asarray(v, np.float64)
                if max(np.linalg.norm(tv), np.linalg.norm(jv)) < 1e-4:
                    # exactly-zero true gradient (a conv bias absorbed by the
                    # following InstanceNorm's mean subtraction): both sides
                    # are float noise — require both to be tiny
                    checked[0] += 1
                    continue
                rel = np.linalg.norm(jv - tv) / (np.linalg.norm(tv) + 1e-12)
                assert rel < 5e-3, f"grad mismatch at {path + (k,)}: rel={rel}"
                checked[0] += 1

    compare(tgrad_tree, jgrads, ())
    assert checked[0] > 100  # every trainable torch leaf was compared

"""Block-family matrix tests: the reference keeps three divergent copies of
the MDUNet blocks (seg / dose / ablation); these tests pin the structural and
numerical differences.

- dose copy: DosePrediction/Models/Nets/blocks_MDUNet.py:149-184 — BatchNorm
  inner blocks, bare 1×1 fuse, 2-branch DualDilatedBlock.
- seg copy: OARSegmentation/Models/Nets/blocks_MDUNet.py:132-215.
- ablation: OARSegmentation/Models/Nets/blocks_MDUNet_ablation.py:41-140.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from dose_prediction_tpu.nn.mdunet import (
    AblationConv31,
    AblationDualDilatedBlock,
    Conv31,
    DualDilatedBlock,
)


def _leaf_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat}


X = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 8, 3)).astype(np.float32))


class TestDoseFamilyStructure:
    def test_conv31_dose_has_bare_fuse_and_batch_inner(self):
        variables = Conv31(4, family="dose").init(jax.random.PRNGKey(0), X)
        paths = _leaf_paths(variables["params"])
        # no outer IN stages in the dose copy
        assert not any("branch3_norm" in p or "fuse_norm" in p for p in paths)
        # inner norms are BatchNorm (running stats live in batch_stats)
        stats = _leaf_paths(variables["batch_stats"])
        assert any(p.startswith("branch3/norm0") for p in stats)
        assert any(p.startswith("branch7/norm0") for p in stats)

    def test_dual_dose_is_two_branch(self):
        variables = DualDilatedBlock(4, family="dose").init(jax.random.PRNGKey(0), X)
        paths = _leaf_paths(variables["params"])
        assert any(p.startswith("branch3/") for p in paths)
        assert any(p.startswith("branch5/") for p in paths)
        assert not any(p.startswith("branch7/") for p in paths)
        assert not any("fuse_norm" in p for p in paths)
        # fuse consumes 2×features channels
        fuse_kernel = variables["params"]["fuse"]["kernel"]
        assert fuse_kernel.shape[-2] == 8

    def test_seg_family_unchanged(self):
        variables = DualDilatedBlock(4, family="seg").init(jax.random.PRNGKey(0), X)
        paths = _leaf_paths(variables["params"])
        assert any(p.startswith("branch7/") for p in paths)
        fuse_kernel = variables["params"]["fuse"]["kernel"]
        assert fuse_kernel.shape[-2] == 12

    @pytest.mark.parametrize("family", ["seg", "dose", "ablation"])
    def test_forward_shapes(self, family):
        for cls in (Conv31, DualDilatedBlock):
            m = cls(4, family=family)
            variables = m.init(jax.random.PRNGKey(0), X)
            y, _ = m.apply(variables, X, train=True, mutable=["batch_stats"])
            assert y.shape == (1, 8, 8, 8, 4)

    def test_ablation_constructors(self):
        for m in (AblationConv31(4), AblationDualDilatedBlock(4)):
            variables = m.init(jax.random.PRNGKey(0), X)
            y, _ = m.apply(variables, X, train=True, mutable=["batch_stats"])
            assert y.shape == (1, 8, 8, 8, 4)


# ---------------------------------------------------------------------------
# numeric golden vs a torch transcription of the dose-copy spec
# ---------------------------------------------------------------------------

class _TorchConvBlock(nn.Module):
    """conv_block_3/_7 of the dose copy (BatchNorm3d + ReLU ×2)."""

    def __init__(self, cin, cout, k):
        super().__init__()
        self.seq = nn.Sequential(
            nn.Conv3d(cin, cout, k, padding=k // 2, bias=True),
            nn.BatchNorm3d(cout), nn.ReLU(),
            nn.Conv3d(cout, cout, k, padding=k // 2, bias=True),
            nn.BatchNorm3d(cout), nn.ReLU(),
        )

    def forward(self, x):
        return self.seq(x)


class _TorchDoseConv31(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.b3 = _TorchConvBlock(cin, cout, 3)
        self.b7 = _TorchConvBlock(cin, cout, 7)
        self.fuse = nn.Conv3d(cout * 2, cout, 1)

    def forward(self, x):
        return self.fuse(torch.cat([self.b3(x), self.b7(x)], dim=1))


def test_conv31_dose_matches_torch_eval():
    cin, cout = 3, 4
    tm = _TorchDoseConv31(cin, cout).eval()
    torch.manual_seed(0)
    for p in tm.parameters():
        nn.init.normal_(p, std=0.3)

    model = Conv31(cout, family="dose")
    variables = model.init(jax.random.PRNGKey(0), X)

    def conv_w(t):  # torch (O,I,kd,kh,kw) -> flax (kd,kh,kw,I,O)
        return jnp.asarray(np.transpose(t.detach().numpy(), (2, 3, 4, 1, 0)))

    params = jax.tree.map(lambda x: x, variables["params"])  # copy
    for branch, tb in (("branch3", tm.b3), ("branch7", tm.b7)):
        for i in (0, 1):
            conv = tb.seq[i * 3]
            params[branch][f"conv{i}"]["kernel"] = conv_w(conv.weight)
            params[branch][f"conv{i}"]["bias"] = jnp.asarray(conv.bias.detach().numpy())
            bn = tb.seq[i * 3 + 1]
            params[branch][f"norm{i}"]["scale"] = jnp.asarray(bn.weight.detach().numpy())
            params[branch][f"norm{i}"]["bias"] = jnp.asarray(bn.bias.detach().numpy())
    params["fuse"]["kernel"] = conv_w(tm.fuse.weight)
    params["fuse"]["bias"] = jnp.asarray(tm.fuse.bias.detach().numpy())

    xt = torch.from_numpy(np.transpose(np.asarray(X), (0, 4, 1, 2, 3)).copy())
    with torch.no_grad():
        ref = tm(xt).numpy().transpose(0, 2, 3, 4, 1)
    # eval mode: BN uses running stats (init mean 0 / var 1), so train=False
    got = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                      X, train=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# seg model matrix (train_light_transeg.py:93-124)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("family", ["seg", "old", "ablation"])
def test_transeg_block_family_matrix(family):
    from dose_prediction_tpu.models import TranSeg

    m = TranSeg(out_ch=3, feature_size=2, hidden_size=24, mlp_dim=48,
                num_heads=3, num_layers=4, block_family=family)
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = m.init(jax.random.PRNGKey(0), x)
    y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (1, 32, 32, 32, 3)
    # the k3 branch is BatchNorm (running stats) only in the old/ablation
    # flavors; the seg copy's k3 branch uses stat-free InstanceNorm
    stats = _leaf_paths(variables["batch_stats"])
    has_bn_branch3 = any(p.startswith("decoder2/conv_block/branch3/norm0") for p in stats)
    assert has_bn_branch3 == (family != "seg")


def test_plain_unetr_forward():
    from dose_prediction_tpu.models import UNETR

    m = UNETR(out_ch=3, feature_size=2, hidden_size=24, mlp_dim=48,
              num_heads=3, num_layers=4)
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 32, 32, 32, 3)
    # plain UNETR has no multi-scale decoder blocks
    paths = _leaf_paths(variables["params"])
    assert not any("conv_block/branch7" in p for p in paths)
    assert any(p.startswith("decoder5/transp_conv") for p in paths)

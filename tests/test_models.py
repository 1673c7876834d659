"""Shape/structure tests for the model zoo on reduced volumes.

The ViT models need spatial size ≥ patch·2^k for the skip pyramids, so they
are exercised at 32³ with patch 16 (grid 2³ = 8 tokens) — same topology as the
128³ flagship config, 64× cheaper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dose_prediction_tpu.models import (
    BaseUNet,
    CascadeC3D,
    DosePyfer,
    HDUNet,
    NLayerDiscriminator,
    TranSeg,
    UnetGenerator3D,
)


def _init_apply(model, x, train=True, **kw):
    variables = model.init(jax.random.PRNGKey(0), x, **kw)
    y = model.apply(variables, x, mutable=["batch_stats"], **kw)[0] if "batch_stats" in variables \
        else model.apply(variables, x, **kw)
    return variables, y


def test_base_unet_shapes():
    x = jnp.zeros((1, 16, 16, 16, 9))
    model = BaseUNet(list_ch=(-1, 4, 8, 16, 32, 64))
    variables, y = _init_apply(model, x)
    assert y.shape == (1, 16, 16, 16, 4)
    # 5 encoder levels × 2 convs + 4 upconvs + 7 decoder convs
    names = set(variables["params"]["encoder"].keys())
    assert {"encoder_1_conv1", "encoder_5_conv2"} <= names


def test_cascade_c3d_shapes():
    x = jnp.zeros((1, 16, 16, 16, 9))
    model = CascadeC3D(out_ch=1, list_ch_A=(-1, 4, 8, 16, 32, 64), list_ch_B=(-1, 4, 8, 16, 32, 64))
    _, (a, b) = _init_apply(model, x)
    assert a.shape == (1, 16, 16, 16, 1)
    assert b.shape == (1, 16, 16, 16, 1)


@pytest.mark.slow
def test_dose_pyfer_topology():
    x = jnp.zeros((1, 32, 32, 32, 9))
    model = DosePyfer(
        out_ch=1,
        list_ch_A=(-1, 4, 8, 16, 32, 64),
        feature_size=4,
        hidden_size=48,
        mlp_dim=96,
        num_layers=8,
        num_heads=6,
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    (out_a, outs_b), _ = model.apply(variables, x, mutable=["batch_stats"])
    assert out_a.shape == (1, 32, 32, 32, 1)
    assert len(outs_b) == 4
    assert outs_b[0].shape == (1, 32, 32, 32, 1)     # full res
    assert outs_b[1].shape == (1, 16, 16, 16, 1)     # 1/2
    assert outs_b[2].shape == (1, 8, 8, 8, 1)        # 1/4
    assert outs_b[3].shape == (1, 4, 4, 4, 1)        # 1/8
    # cascade freeze surface: net_A / conv_out_A are separate top-level subtrees
    assert {"net_A", "net_B", "conv_out_A"} <= set(variables["params"].keys())
    # ViT with 8 layers → taps exist
    assert "block7" in variables["params"]["net_B"]["encoder"]["vit"]


def test_transeg_topology():
    x = jnp.zeros((1, 32, 32, 32, 1))
    model = TranSeg(out_ch=8, feature_size=4, hidden_size=48, mlp_dim=96,
                    num_layers=12, num_heads=6)
    variables = model.init(jax.random.PRNGKey(0), x)
    y, _ = model.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == (1, 32, 32, 32, 8)


def test_transeg_remat_blocks_checkpoint_compatible():
    """remat_blocks must not change the param tree or the forward result —
    a checkpoint trained either way restores into the other."""
    x = jnp.ones((1, 32, 32, 32, 1)) * 0.1
    kw = dict(out_ch=8, feature_size=4, hidden_size=48, mlp_dim=96,
              num_layers=4, num_heads=2)
    base = TranSeg(**kw)
    remat = TranSeg(remat_blocks=True, **kw)
    variables = base.init(jax.random.PRNGKey(0), x)
    v2 = remat.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    y_base, _ = base.apply(variables, x, mutable=["batch_stats"])
    y_remat, _ = remat.apply(variables, x, mutable=["batch_stats"])
    assert jnp.allclose(y_base, y_remat, atol=1e-6)

    # gradients flow through the remat'd decoder stages
    def loss(params):
        y, _ = remat.apply({**variables, "params": params}, x,
                           mutable=["batch_stats"])
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.slow
def test_hdunet_shapes():
    x = jnp.zeros((1, 16, 16, 16, 9))
    model = HDUNet(growth_rate=4, upsample_chan=8)
    variables, y = _init_apply(model, x)
    assert y.shape == (1, 16, 16, 16, 1)


@pytest.mark.slow
def test_dosegan_generator_and_discriminator():
    x = jnp.zeros((1, 32, 32, 32, 9))
    gen = UnetGenerator3D(out_ch=1, ngf=4, num_levels=5)
    variables = gen.init(jax.random.PRNGKey(0), x)
    y, _ = gen.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == (1, 32, 32, 32, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head

    # the reference critic is unconditional: 1ch dose only
    # (NLayerDiscriminator(input_nc=1), train_light_dosegan.py:74,131-136)
    d = NLayerDiscriminator(ndf=4, n_layers=3)
    dv = d.init(jax.random.PRNGKey(1), y)
    score, _ = d.apply(dv, y, mutable=["batch_stats"])
    assert score.shape == (1, 4, 4, 4, 1)  # 3 stride-2 blocks: 32 -> 4


@pytest.mark.slow
def test_dose_pyfer_grad_flows():
    """Gradients flow to net_B and are exactly zero-masked nowhere (sanity)."""
    x = jnp.ones((1, 32, 32, 32, 9)) * 0.1
    model = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                      hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        (out_a, outs_b), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, mutable=["batch_stats"])
        return jnp.mean(jnp.abs(outs_b[0])) + 0.0 * jnp.mean(out_a)

    grads = jax.grad(loss_fn)(variables["params"])
    leaf = grads["net_B"]["decoder"]["decoder1"]["conv_block"]["fuse"]["kernel"]
    assert float(jnp.sum(jnp.abs(leaf))) > 0

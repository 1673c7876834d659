"""Shape tests for the experimental model zoo + ViT-GAN step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.models.experiments import (
    ExperimentalCascade,
    SharedEncoderModel,
    SharedUNetModel,
    VitGenerator,
    resnet10,
)


def test_vit_generator_outputs():
    x = jnp.zeros((1, 32, 32, 32, 9))
    model = VitGenerator(out_ch=1, feature_size=2, hidden_size=24, mlp_dim=48,
                         num_layers=4, num_heads=2, mode_multi_dec=True, act="mish")
    v = model.init(jax.random.PRNGKey(0), x)
    outs, _ = model.apply(v, x, mutable=["batch_stats"])
    assert [tuple(o.shape) for o in outs] == [
        (1, 32, 32, 32, 1), (1, 16, 16, 16, 1), (1, 8, 8, 8, 1), (1, 4, 4, 4, 1)]


def test_shared_encoder_model():
    x = jnp.zeros((1, 32, 32, 32, 9))
    model = SharedEncoderModel(out_ch=1, feature_size_a=2, feature_size_b=4,
                               hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)
    v = model.init(jax.random.PRNGKey(0), x)
    (a, b), _ = model.apply(v, x, mutable=["batch_stats"])
    assert a.shape == b.shape == (1, 32, 32, 32, 1)
    assert float(jnp.max(jnp.abs(a))) <= 1.0  # tanh heads


@pytest.mark.parametrize("enc,dec", [(1, 3), (2, 4), (1, 5)])
def test_experimental_cascade_modes(enc, dec):
    x = jnp.zeros((1, 16, 16, 16, 9))
    small = (-1, 2, 4, 8, 16, 32)
    model = ExperimentalCascade(out_ch=1, list_ch_A=small, list_ch_B=small,
                                mode_encoder_A=enc, mode_encoder_B=1,
                                mode_decoder_A=dec, mode_decoder_B=1)
    v = model.init(jax.random.PRNGKey(0), x)
    (a, b), _ = model.apply(v, x, mutable=["batch_stats"])
    assert a.shape == (1, 16, 16, 16, 1)
    assert b.shape == (1, 16, 16, 16, 1)


def test_shared_unet_model_weight_sharing():
    x = jnp.zeros((1, 16, 16, 16, 9))
    model = SharedUNetModel(out_ch=1, list_ch=(-1, 2, 4, 8, 16, 32, 64),
                            mode_encoder=1, mode_decoder=1)
    v = model.init(jax.random.PRNGKey(0), x)
    (a, b), _ = model.apply(v, x, mutable=["batch_stats"])
    assert a.shape == b.shape == (1, 16, 16, 16, 1)
    # the shared encoder/decoder exist exactly once in the param tree
    assert "shared_encoder" in v["params"] and "shared_decoder" in v["params"]


def test_shared_unetr_model_a():
    from dose_prediction_tpu.models.experiments import SharedUNetRModelA

    x = jnp.zeros((1, 32, 32, 32, 9))
    m = SharedUNetRModelA(out_ch=1, feature_size=2, hidden_size=24, mlp_dim=48,
                          num_layers=12, num_heads=2)
    v = m.init(jax.random.PRNGKey(0), x)
    (a, b), _ = m.apply(v, x, mutable=["batch_stats"])
    assert a.shape == (1, 32, 32, 32, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shared_unetr_model():
    from dose_prediction_tpu.models.experiments import SharedUNetRModel

    # in_ch_b must equal feature_size + in_ch for the stage-B concat
    x = jnp.zeros((1, 32, 32, 32, 9))
    m = SharedUNetRModel(in_ch_b=2 + 9, out_ch=1, feature_size=2, hidden_size=24,
                         mlp_dim=48, num_layers=12, num_heads=2)
    v = m.init(jax.random.PRNGKey(0), x)
    (a, b), _ = m.apply(v, x, mutable=["batch_stats"])
    # stage A decodes from tap 10 (16× up through 4 stages from 2³ grid ⇒ 32³)
    assert a.shape == (1, 32, 32, 32, 1)
    assert b.shape == (1, 32, 32, 32, 1)
    # the ViT is genuinely shared
    assert "vit" in v["params"] and "skip2B" in v["params"]


def test_model_monai_cascade():
    from dose_prediction_tpu.models.experiments import ModelMonai

    x = jnp.zeros((1, 32, 32, 32, 9))
    m = ModelMonai(out_ch=1, feat_ch_a=4, channels_a=(4, 8, 16), channels_b=(4, 8, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    a, b = m.apply(v, x)
    assert a.shape == (1, 32, 32, 32, 1)
    assert b.shape == (1, 32, 32, 32, 1)


@pytest.mark.slow
def test_resnet10_critic():
    x = jnp.zeros((2, 32, 32, 32, 1))
    model = resnet10(num_classes=1)
    v = model.init(jax.random.PRNGKey(0), x)
    y, _ = model.apply(v, x, mutable=["batch_stats"])
    assert y.shape == (2, 1)


@pytest.mark.slow
def test_vitgan_step(rng, tmp_path):
    from dose_prediction_tpu.train.gan import VitGANTrainer
    from dose_prediction_tpu.train.trainers import TrainConfig

    cfg = TrainConfig(max_epochs=1, max_steps=1, learning_rate=1e-3,
                      log_dir=str(tmp_path), ckpt_dir=str(tmp_path))
    gen = VitGenerator(out_ch=1, feature_size=2, hidden_size=24, mlp_dim=48,
                       num_layers=4, num_heads=2)
    tr = VitGANTrainer(cfg, generator=gen, example_shape=(1, 32, 32, 32, 9),
                       unfreeze_epoch=0)
    inp = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 9)).astype(np.float32))
    dose = jnp.abs(jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32)))
    mask = (dose > 0.4).astype(jnp.float32)
    batch = {"input": inp, "gt": jnp.concatenate([dose, mask], -1)}
    g1, d1, info = tr.step(tr.g_state, tr.d_state, batch, train_d=True)
    assert np.isfinite(float(info["g_loss"]))
    assert np.isfinite(float(info["d_loss"]))
    assert int(d1.step) == 1
    # frozen-discriminator window
    g2, d2, info2 = tr.step(g1, d1, batch, train_d=False)
    assert int(d2.step) == 1  # unchanged

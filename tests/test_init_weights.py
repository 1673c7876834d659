"""pix2pix-style re-initialization (nn/init.py::reinit_weights — the
init_weights parity target, train_light_gan.py:29-59)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tree():
    return {
        "conv": {"kernel": jnp.ones((3, 3, 3, 4, 8)), "bias": jnp.ones((8,))},
        "dense": {"kernel": jnp.ones((16, 4)), "bias": jnp.ones((4,))},
        "norm": {"scale": jnp.zeros((8,)), "bias": jnp.ones((8,))},
        "stats": {"mean": jnp.full((8,), 7.0)},
    }


@pytest.mark.parametrize("kind", ["normal", "xavier", "kaiming", "orthogonal"])
def test_reinit_weights_types(kind):
    from dose_prediction_tpu.nn.init import reinit_weights

    out = reinit_weights(_tree(), jax.random.PRNGKey(0), init_type=kind)
    # kernels changed, biases zeroed, scales near 1, non-init leaves untouched
    assert not np.allclose(np.asarray(out["conv"]["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["conv"]["bias"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["dense"]["bias"]), 0.0)
    assert abs(float(out["norm"]["scale"].mean()) - 1.0) < 0.1
    np.testing.assert_array_equal(np.asarray(out["norm"]["bias"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["stats"]["mean"]), 7.0)


def test_reinit_statistics():
    from dose_prediction_tpu.nn.init import reinit_weights

    big = {"conv": {"kernel": jnp.ones((3, 3, 3, 16, 32))}}
    normal = reinit_weights(big, jax.random.PRNGKey(1), init_type="normal",
                            init_gain=0.02)
    assert float(jnp.std(normal["conv"]["kernel"])) == pytest.approx(0.02, rel=0.1)
    kaiming = reinit_weights(big, jax.random.PRNGKey(2), init_type="kaiming")
    fan_in = 27 * 16
    assert float(jnp.std(kaiming["conv"]["kernel"])) == pytest.approx(
        np.sqrt(2.0 / fan_in), rel=0.1)


def test_reinit_orthogonal_is_orthogonal():
    from dose_prediction_tpu.nn.init import reinit_weights

    t = {"dense": {"kernel": jnp.ones((64, 16))}}
    out = reinit_weights(t, jax.random.PRNGKey(3), init_type="orthogonal",
                         init_gain=1.0)
    k = np.asarray(out["dense"]["kernel"])
    np.testing.assert_allclose(k.T @ k, np.eye(16), atol=1e-5)


@pytest.mark.slow
def test_vitgan_trainer_accepts_init_type(tmp_path):
    from dose_prediction_tpu.models.experiments import VitGenerator
    from dose_prediction_tpu.train.gan import VitGANTrainer
    from dose_prediction_tpu.train.trainers import TrainConfig

    gen = VitGenerator(hidden_size=24, mlp_dim=48, num_layers=2, num_heads=2,
                       feature_size=2)
    cfg = TrainConfig(max_epochs=1, max_steps=1,
                      ckpt_dir=str(tmp_path / "c"), log_dir=str(tmp_path / "l"))
    tr = VitGANTrainer(cfg, generator=gen, example_shape=(1, 16, 16, 16, 9),
                       init_type="normal")
    # every conv/linear bias is zero after the re-init
    flat = jax.tree_util.tree_flatten_with_path(tr.g_state.params)[0]
    biases = [leaf for path, leaf in flat
              if getattr(path[-1], "key", "") == "bias"]
    assert biases and all(float(jnp.abs(b).max()) == 0.0 for b in biases)

"""Per-block remat (remat_blocks=True) matches the plain model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.models import DosePyfer
from dose_prediction_tpu.train import losses as L

SMALL = dict(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
             hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)


def test_remat_blocks_same_params_and_outputs(rng):
    plain = DosePyfer(**SMALL, remat_blocks=False)
    remat = DosePyfer(**SMALL, remat_blocks=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 9)).astype(np.float32))
    v = plain.init(jax.random.PRNGKey(0), x)
    # remat wrapping must not change the param tree: the same variables apply
    (a1, b1), _ = plain.apply(v, x, mutable=["batch_stats"])
    (a2, b2), _ = remat.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    for p, q in zip(b1, b2):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_remat_blocks_grads_close(rng):
    plain = DosePyfer(**SMALL, remat_blocks=False)
    remat = DosePyfer(**SMALL, remat_blocks=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 9)).astype(np.float32))
    dose = jnp.abs(jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32)))
    mask = (dose > 0.4).astype(jnp.float32)
    gt = jnp.concatenate([dose, mask], -1)
    v = plain.init(jax.random.PRNGKey(0), x)

    def make_loss(model):
        def loss_fn(params):
            (pa, pb), _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, mutable=["batch_stats"])
            return L.gen_loss((pa, pb), gt, cascade=True, freeze=True)
        return loss_fn

    l1, g1 = jax.value_and_grad(make_loss(plain))(v["params"])
    l2, g2 = jax.value_and_grad(make_loss(remat))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    gscale = max(float(np.abs(np.asarray(l)).max()) for l in jax.tree.leaves(g1))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a) / gscale, np.asarray(b) / gscale,
                                   atol=1e-4, rtol=0)

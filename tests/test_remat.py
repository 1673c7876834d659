"""Rematerialized forward produces the same loss and gradients as plain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.models import DosePyfer
from dose_prediction_tpu.train import losses as L

SMALL = dict(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
             hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)


@pytest.mark.slow
def test_remat_loss_and_grads_match(rng):
    model = DosePyfer(**SMALL)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 9)).astype(np.float32))
    dose = jnp.abs(jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32)))
    mask = (dose > 0.4).astype(jnp.float32)
    gt = jnp.concatenate([dose, mask], -1)
    variables = model.init(jax.random.PRNGKey(0), x)
    params, stats = variables["params"], variables["batch_stats"]

    def apply_fn(params, stats, x):
        return model.apply({"params": params, "batch_stats": stats},
                           x, train=True, mutable=["batch_stats"])

    def make_loss(apply):
        def loss_fn(params):
            (pa, pb), _ = apply(params, stats, x)
            return L.gen_loss((pa, pb), gt, cascade=True, freeze=True)
        return loss_fn

    l_plain, g_plain = jax.value_and_grad(make_loss(apply_fn))(params)
    l_remat, g_remat = jax.value_and_grad(make_loss(jax.checkpoint(apply_fn)))(params)

    # remat changes op scheduling/fusion, so values agree only to fp32
    # reassociation tolerance, not bitwise
    np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-5)
    # gradients agree to fp32 reassociation tolerance at the GLOBAL gradient
    # scale: per-leaf scaling is ill-posed for leaves whose true gradient is
    # analytically zero (biases feeding InstanceNorm — a shift cancels), where
    # both runs produce only ~1e-7 fp noise.
    global_scale = max(float(np.abs(np.asarray(l)).max())
                       for l in jax.tree.leaves(g_plain))
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a / global_scale, b / global_scale,
                                   atol=1e-4, rtol=0)


@pytest.mark.slow
def test_remat_step_runs(rng):
    """The remat=True step factory trains (loss finite, step increments)."""
    from dose_prediction_tpu.train import state as S
    from dose_prediction_tpu.train.steps import make_pyfer_train_step

    model = DosePyfer(**SMALL)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 9)).astype(np.float32))
    dose = jnp.abs(jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32)))
    mask = (dose > 0.4).astype(jnp.float32)
    batch = {"input": x, "gt": jnp.concatenate([dose, mask], -1)}
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = S.make_optimizer(learning_rate=1e-3)
    state = S.create_train_state(variables, tx)
    step = make_pyfer_train_step(model, tx, donate=False, remat=True)
    state, loss = step(state, batch)
    assert np.isfinite(float(loss)) and int(state.step) == 1

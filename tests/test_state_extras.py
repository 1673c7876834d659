"""Tests: split encoder/decoder LRs, ablation block, moving loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dose_prediction_tpu.nn.mdunet import AblationDualDilatedBlock
from dose_prediction_tpu.train import state as S


def test_split_lr_optimizer_applies_different_rates():
    params = {
        "encoder": {"w": jnp.ones((4,))},
        "decoder": {"w": jnp.ones((4,))},
    }
    tx = S.make_split_lr_optimizer(lr_encoder=0.1, lr_decoder=0.001)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    enc_step = float(jnp.abs(updates["encoder"]["w"][0]))
    dec_step = float(jnp.abs(updates["decoder"]["w"][0]))
    # adam first-step magnitude ≈ lr
    assert enc_step > 50 * dec_step


def test_ablation_dual_dilated_block(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 4)).astype(np.float32))
    block = AblationDualDilatedBlock(6)
    v = block.init(jax.random.PRNGKey(0), x)
    y, updates = block.apply(v, x, mutable=["batch_stats"])
    assert y.shape == (1, 8, 8, 8, 6)
    assert (np.asarray(y) >= 0).all()  # relu-terminated
    # batch stats exist for all branches + fuse
    assert "fuse_norm" in v["batch_stats"]


def test_update_moving_loss_ema():
    m = S.update_moving_loss(jnp.array(jnp.nan), jnp.array(2.0))
    assert float(m) == 2.0
    m = S.update_moving_loss(m, jnp.array(1.0), eps=0.01)
    assert float(m) == pytest.approx(2.0 * 0.99 + 0.01, rel=1e-6)


def test_grad_accum_matches_large_batch():
    """make_optimizer(grad_accum=2): two micro-batch steps == one batch-2
    step (losses are batch means, so averaged grads coincide)."""
    import jax
    import jax.numpy as jnp
    import optax

    from dose_prediction_tpu.train import state as S

    w0 = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)), jnp.float32)}
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 6)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(2).normal(size=(4, 3)), jnp.float32)

    def loss(params, xb, yb):
        return jnp.mean((xb @ params["w"] - yb) ** 2)

    # one batch-4 step
    tx_big = S.make_optimizer(learning_rate=1e-2)
    st = tx_big.init(w0)
    g = jax.grad(loss)(w0, x, y)
    up, st = tx_big.update(g, st, w0)
    ref = optax.apply_updates(w0, up)

    # two micro-batch-2 steps with grad_accum=2
    tx_acc = S.make_optimizer(learning_rate=1e-2, grad_accum=2)
    st2 = tx_acc.init(w0)
    params = w0
    for lo in (0, 2):
        g = jax.grad(loss)(params, x[lo:lo + 2], y[lo:lo + 2])
        up, st2 = tx_acc.update(g, st2, params)
        params = optax.apply_updates(params, up)
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(ref["w"]),
                               rtol=1e-5, atol=1e-6)

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

"""ViT-GAN training — the train_light_gan.py entry point.

Generator = the non-cascade ViT generator (MainSubsetModel family); critic =
MedicalNet-style 3D ResNet-10. Reference semantics (train_light_gan.py):
- G loss = δ3 · BCE(fake_logits → 1) + GenLoss deep-supervision recon (:184-188)
- D loss = ½ (BCE(real→1) + BCE(fake→0)) (:199-201)
- discriminator frozen until ``unfreeze_epoch`` (FineTuneCB, :85-96), mirrored
  here by skipping D updates until that epoch;
- validation via sliding-window inference with an ×80 dose scale (:224-238).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.pipeline import device_prefetch, dose_batches
from dose_prediction_tpu.models.experiments import VitGenerator, resnet10
from dose_prediction_tpu.train import losses as L
from dose_prediction_tpu.train import state as S
from dose_prediction_tpu.train.state import TrainState, update_moving_loss
from dose_prediction_tpu.utils.logging import MetricLogger


def make_vitgan_train_step(generator, discriminator, g_tx, d_tx, *,
                           delta3: float = 0.01, delta1: float = 10.0,
                           delta2: float = 1.0):
    """One jit program running a G update and (conditionally) a D update;
    ``train_d`` implements the FineTuneCB freeze window."""

    def g_apply(gp, gs, x):
        return generator.apply({"params": gp, "batch_stats": gs}, x,
                               train=True, mutable=["batch_stats"])

    def d_apply(dp, ds, x):
        return discriminator.apply({"params": dp, "batch_stats": ds}, x,
                                   train=True, mutable=["batch_stats"])

    def g_loss_fn(gp, g_stats, d_state, batch):
        preds, upd = g_apply(gp, g_stats, batch["input"])
        fake_logits, _ = d_apply(d_state.params, d_state.batch_stats, preds[0])
        adv = L.bce_with_logits(fake_logits, jnp.ones_like(fake_logits))
        recon = L.gen_loss(preds, batch["gt"], delta1=delta1, delta2=delta2,
                           cascade=False)
        return delta3 * adv + recon, upd["batch_stats"]

    def d_loss_fn(dp, d_stats, g_state, batch):
        gt_dose = batch["gt"][..., 0:1]
        preds, _ = g_apply(g_state.params, g_state.batch_stats, batch["input"])
        real_logits, upd = d_apply(dp, d_stats, gt_dose)
        fake_logits, upd2 = d_apply(dp, upd["batch_stats"], preds[0])
        loss = 0.5 * (L.bce_with_logits(real_logits, jnp.ones_like(real_logits))
                      + L.bce_with_logits(fake_logits, jnp.zeros_like(fake_logits)))
        return loss, upd2["batch_stats"]

    @partial(jax.jit, static_argnames=("train_d",), donate_argnums=(0, 1))
    def step(g_state: TrainState, d_state: TrainState, batch, train_d: bool = True):
        (g_loss, g_stats), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params, g_state.batch_stats, d_state, batch)
        g_updates, g_opt = g_tx.update(g_grads, g_state.opt_state, g_state.params)
        g_state = g_state.replace(
            step=g_state.step + 1,
            params=optax.apply_updates(g_state.params, g_updates),
            batch_stats=g_stats, opt_state=g_opt,
            moving_loss=update_moving_loss(g_state.moving_loss, g_loss),
        )
        d_loss = jnp.float32(0.0)
        if train_d:
            (d_loss, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_state.params, d_state.batch_stats, g_state, batch)
            d_updates, d_opt = d_tx.update(d_grads, d_state.opt_state, d_state.params)
            d_state = d_state.replace(
                step=d_state.step + 1,
                params=optax.apply_updates(d_state.params, d_updates),
                batch_stats=d_stats, opt_state=d_opt,
                moving_loss=update_moving_loss(d_state.moving_loss, d_loss),
            )
        return g_state, d_state, {"g_loss": g_loss, "d_loss": d_loss}

    return step


class VitGANTrainer:
    def __init__(self, cfg, *, generator: Optional[VitGenerator] = None,
                 example_shape: Sequence[int] = (1, 128, 128, 128, 9),
                 unfreeze_epoch: int = 10, delta3: float = 0.01):
        self.cfg = cfg
        self.unfreeze_epoch = unfreeze_epoch
        self.gen = generator if generator is not None else VitGenerator()
        self.disc = resnet10(num_classes=1)
        gx = jnp.zeros(example_shape, jnp.float32)
        dx = jnp.zeros((*example_shape[:-1], 1), jnp.float32)
        g_vars = jax.jit(self.gen.init)(jax.random.PRNGKey(cfg.seed), gx)
        d_vars = jax.jit(self.disc.init)(jax.random.PRNGKey(cfg.seed + 1), dx)
        self.g_tx = S.make_optimizer(learning_rate=cfg.learning_rate,
                                     weight_decay=cfg.weight_decay)
        self.d_tx = S.make_optimizer(learning_rate=cfg.learning_rate)
        self.g_state = S.create_train_state(g_vars, self.g_tx)
        self.d_state = S.create_train_state(d_vars, self.d_tx)
        self.step = make_vitgan_train_step(self.gen, self.disc, self.g_tx, self.d_tx,
                                           delta3=delta3, delta1=cfg.delta1,
                                           delta2=cfg.delta2)
        self.logger = MetricLogger(cfg.log_dir, run_name="vitgan")

    def fit(self, train_ds: OpenKBPDataset):
        cfg = self.cfg
        global_step = 0
        for epoch in range(cfg.max_epochs):
            train_d = epoch >= self.unfreeze_epoch
            g_losses, d_losses = [], []
            for batch in device_prefetch(dose_batches(
                    train_ds, batch_size=cfg.batch_size, seed=cfg.seed + epoch)):
                self.g_state, self.d_state, info = self.step(
                    self.g_state, self.d_state, batch, train_d=train_d)
                g_losses.append(float(info["g_loss"]))
                d_losses.append(float(info["d_loss"]))
                global_step += 1
                if cfg.max_steps is not None and global_step >= cfg.max_steps:
                    return
            self.logger.log({"gan_loss": float(np.mean(g_losses)),
                             "disc_loss": float(np.mean(d_losses))}, epoch + 1)

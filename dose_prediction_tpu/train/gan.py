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
from typing import Any, Dict, Optional, Sequence

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
from dose_prediction_tpu.train.trainers import (
    _drains_checkpoints,
    _save_epoch_slots,
    _stop_requested,
)
from dose_prediction_tpu.utils.logging import MetricLogger


def make_vitgan_train_step(generator, discriminator, g_tx, d_tx, *,
                           delta3: float = 0.01, delta1: float = 10.0,
                           delta2: float = 1.0, packed: bool = False,
                           d_freeze_mask=None):
    """One jit program running a G update and (conditionally) a D update;
    ``train_d`` implements the FineTuneCB freeze window. ``packed=True``
    takes the bit-packed feed and unpacks it on device (data/packed.py).
    ``d_freeze_mask`` is a critic-params-shaped tree of python bools marking
    MedicalNet-pretrained leaves; with ``freeze_d=True`` their updates are
    zeroed — the requires_grad=False-until-unfreeze semantics of
    train_light_gan.py:139-141 (mask leaves are static, so frozen updates
    compile away)."""

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

    @partial(jax.jit, static_argnames=("train_d", "freeze_d"), donate_argnums=(0, 1))
    def step(g_state: TrainState, d_state: TrainState, batch,
             train_d: bool = True, freeze_d: bool = False):
        if packed:
            from dose_prediction_tpu.data.packed import unpack_dose_batch

            batch = unpack_dose_batch(batch)
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
            if freeze_d and d_freeze_mask is not None:
                d_updates = jax.tree.map(
                    lambda u, frozen: jnp.zeros_like(u) if frozen else u,
                    d_updates, d_freeze_mask)
            d_state = d_state.replace(
                step=d_state.step + 1,
                params=optax.apply_updates(d_state.params, d_updates),
                batch_stats=d_stats, opt_state=d_opt,
                moving_loss=update_moving_loss(d_state.moving_loss, d_loss),
            )
        return g_state, d_state, {"g_loss": g_loss, "d_loss": d_loss}

    return step


def _load_pretrained_critic(path: str, d_vars):
    """create_pretrained_medical_resnet for the TPU critic
    (train_light_gan.py:136-141 / models_experiments.py:1555-1588): convert a
    MedicalNet torch pickle, merge it into the ResNet-10 variables with
    strict=False semantics, and return the per-leaf 'pretrained' mask used to
    freeze those leaves until the FineTuneCB unfreeze epoch. MedicalNet
    segmentation pretrains carry no fc — those leaves stay at init and keep
    training from epoch 0, exactly as requires_grad partitioning does."""
    import jax.tree_util as jtu

    from dose_prediction_tpu.core import torch_import as TI
    from dose_prediction_tpu.core.checkpoint import flatten_params, merge_partial

    sd = TI.load_torch_checkpoint(path)
    tree = TI.state_dict_to_tree(sd, TI.resnet10_key_map)
    p_tree, s_tree = TI.split_batch_stats(tree)
    params, stats = merge_partial(d_vars["params"], p_tree)
    bstats = d_vars.get("batch_stats", {})
    if s_tree:
        bstats, _ = merge_partial(bstats, s_tree)
    src = flatten_params(p_tree)
    tgt = flatten_params(d_vars["params"])
    flat_mask = [k in src and tuple(np.shape(src[k])) == tuple(np.shape(v))
                 for k, v in tgt.items()]
    mask = jtu.tree_unflatten(jtu.tree_structure(d_vars["params"]), flat_mask)
    return {"params": params, "batch_stats": bstats}, mask, stats


class VitGANTrainer:
    """Full reference harness: alternating G/(windowed-freeze)D training,
    sliding-window validation with roi = the full image size and the ×80 dose
    scale (train_light_gan.py:219-238), best checkpoints on
    mean_dose_score=max + every-epoch 'last' slot with resume (:268-270), and
    the OpenKBP test sweep."""

    def __init__(self, cfg, *, generator: Optional[VitGenerator] = None,
                 example_shape: Sequence[int] = (1, 128, 128, 128, 9),
                 unfreeze_epoch: int = 10, delta3: float = 2.0,
                 g_lr: float = 1e-4, d_lr: float = 5e-3,
                 val_scale: float = 80.0, init_type: Optional[str] = None,
                 init_gain: float = 0.02,
                 pretrained_critic: Optional[str] = None,
                 discriminator=None):
        # reference defaults: delta3=2, G_lr=10e-5, D_lr=5·10e-4, Adam8bit
        # optimizers (train_light_gan.py:104-107,250-251; cfg.optimizer
        # selects adam8bit here too)
        from dose_prediction_tpu.core import checkpoint as C
        from dose_prediction_tpu.infer.sliding_window import make_sliding_window_fn

        self.cfg = cfg
        self.unfreeze_epoch = unfreeze_epoch
        self.val_scale = val_scale
        self.roi_size = tuple(example_shape[1:4])  # roi = IMAGE_SIZE³ (:219-222)
        # default generator = the exact reference config (MainSubsetModel
        # with num_layers=8/num_heads=6/mode_multi_dec/mish/multiS_conv=False,
        # train_light_gan.py:124-133)
        from dose_prediction_tpu.models.experiments import vitgan_generator

        self.gen = generator if generator is not None else vitgan_generator()
        self.disc = discriminator if discriminator is not None else resnet10(num_classes=1)
        gx = jnp.zeros(example_shape, jnp.float32)
        dx = jnp.zeros((*example_shape[:-1], 1), jnp.float32)
        g_vars = jax.jit(self.gen.init)(jax.random.PRNGKey(cfg.seed), gx)
        d_vars = jax.jit(self.disc.init)(jax.random.PRNGKey(cfg.seed + 1), dx)
        if init_type is not None:
            # pix2pix-style re-init of the GENERATOR only (init_weights,
            # train_light_gan.py:145-146 — the critic keeps its MedicalNet /
            # default init)
            from dose_prediction_tpu.nn.init import reinit_weights

            g_vars = {**g_vars, "params": reinit_weights(
                g_vars["params"], jax.random.PRNGKey(cfg.seed + 2),
                init_type=init_type, init_gain=init_gain)}
        self.d_frozen_mask = None
        if pretrained_critic is not None:
            d_vars, self.d_frozen_mask, _ = _load_pretrained_critic(
                pretrained_critic, d_vars)
        self.g_tx = S.make_optimizer(learning_rate=g_lr, kind=cfg.optimizer)
        self.d_tx = S.make_optimizer(learning_rate=d_lr, kind=cfg.optimizer)
        # generator carries the ViT → Megatron tp rules apply; the ResNet
        # critic is conv-only → replicated params, dp only
        from dose_prediction_tpu.train.trainers import _init_gan_states_with_mesh

        (self.g_state, self.d_state, self.mesh, self.batch_sharding,
         self.val_sharding) = _init_gan_states_with_mesh(
            g_vars, d_vars, self.g_tx, self.d_tx, cfg.mesh_shape,
            g_tp_rules=None, d_tp_rules=())
        self.step = make_vitgan_train_step(self.gen, self.disc, self.g_tx, self.d_tx,
                                           delta3=delta3, delta1=cfg.delta1,
                                           delta2=cfg.delta2,
                                           packed=cfg.feed_dtype == "packed",
                                           d_freeze_mask=self.d_frozen_mask)
        self.logger = MetricLogger(cfg.log_dir, run_name="vitgan")
        self.ckpt = C.CheckpointManager(cfg.ckpt_dir, monitor="mean_dose_score",
                                        mode="max")
        self._make_sw = make_sliding_window_fn
        self._sw_runs: Dict[int, Any] = {}
        self._val_loss_fn = jax.jit(lambda pred, gt: L.gen_loss(pred, gt, mode="val"))

    def _sw_run(self, sw_batch_size: int):
        run = self._sw_runs.get(sw_batch_size)
        if run is None:
            def predict(windows, variables):
                outs, _ = self.gen.apply(variables, windows, train=False,
                                         mutable=["batch_stats"])
                return outs[0]   # lambda x: self.forward(x)[0] (:225)

            run = self._make_sw(predict, roi_size=self.roi_size,
                                sw_batch_size=sw_batch_size, out_channels=1)
            self._sw_runs[sw_batch_size] = run
        return run

    def validate(self, val_ds: OpenKBPDataset, *, sw_batch_size: int = 4):
        """Sliding-window val (train_light_gan.py:219-246): GenLoss val loss on
        the blended output + masked MAE ×80 → mean_dose_score."""
        from dose_prediction_tpu.train.trainers import _sliding_val_sweep

        return _sliding_val_sweep(
            self._sw_run(sw_batch_size),
            {"params": self.g_state.params,
             "batch_stats": self.g_state.batch_stats},
            val_ds, self._val_loss_fn, self.val_scale)

    @_drains_checkpoints
    def fit(self, train_ds: OpenKBPDataset, val_ds: Optional[OpenKBPDataset] = None,
            *, resume: bool = True):
        from dose_prediction_tpu.train.trainers import (
            _check_mesh_batch,
            _feed_rows,
            _host_mean,
            _resume_guard_config,
            _traced_epoch,
            _train_batches,
            _try_resume,
        )

        cfg = self.cfg
        _check_mesh_batch(cfg, self.mesh)
        start_epoch = 0
        if resume:
            restored, start_epoch = _try_resume(
                self.ckpt, {"g": self.g_state, "d": self.d_state, "epoch": 0},
                run_config=_resume_guard_config(
                    self.cfg, self.gen, self.disc))
            if restored is not None:
                self.g_state, self.d_state = restored["g"], restored["d"]
        global_step = int(self.g_state.step)
        for epoch in range(start_epoch, cfg.max_epochs):
            # With a MedicalNet-pretrained critic, D trains from epoch 0 but
            # its pretrained leaves are frozen until the unfreeze epoch
            # (requires_grad partitioning, train_light_gan.py:139-141);
            # without one, the whole critic waits for the window.
            train_d = epoch >= self.unfreeze_epoch or self.d_frozen_mask is not None
            freeze_d = self.d_frozen_mask is not None and epoch < self.unfreeze_epoch
            if epoch == self.unfreeze_epoch and self.d_frozen_mask is not None:
                # FineTuneCB rebuilds both optimizers at the unfreeze epoch
                # (train_light_gan.py:89-96: configure_optimizers → fresh
                # Adam state for G and D)
                self.g_state = self.g_state.replace(
                    opt_state=self.g_tx.init(self.g_state.params))
                self.d_state = self.d_state.replace(
                    opt_state=self.d_tx.init(self.d_state.params))
            g_losses, d_losses = [], []
            for batch in _traced_epoch(device_prefetch(
                    _train_batches(cfg, train_ds, epoch,
                                   drop_last=self.batch_sharding is not None,
                                   process_rows=_feed_rows(self.batch_sharding)),
                    sharding=self.batch_sharding,
                    local_rows=_feed_rows(self.batch_sharding) is not None),
                    cfg.profile_dir if epoch == start_epoch else None):
                self.g_state, self.d_state, info = self.step(
                    self.g_state, self.d_state, batch,
                    train_d=train_d, freeze_d=freeze_d)
                g_losses.append(info["g_loss"])
                d_losses.append(info["d_loss"])
                global_step += 1
                if _stop_requested(cfg, global_step):
                    break
            self.logger.log({"gan_loss": _host_mean(g_losses),
                             "disc_loss": _host_mean(d_losses)}, epoch + 1)
            if val_ds is not None and (epoch + 1) % cfg.check_val == 0:
                metrics = self.validate(val_ds)
                self.logger.log(metrics, epoch + 1)
                self.ckpt.save(epoch,
                               {"g": self.g_state, "d": self.d_state, "epoch": epoch},
                               {"mean_dose_score": metrics["mean_dose_score"]})
            _save_epoch_slots(self.ckpt, cfg, epoch, global_step,
                              {"g": self.g_state, "d": self.d_state, "epoch": epoch})
            if _stop_requested(cfg, global_step):
                return

    def test(self, test_ds: OpenKBPDataset, *, sw_batch_size: int = 4,
             with_ivs: bool = True, plots_dir=None):
        """OpenKBP test sweep on sliding-window ×80 predictions."""
        from dose_prediction_tpu.evaluation import metrics as M
        from dose_prediction_tpu.train.trainers import evaluate_dose_model

        run = self._sw_run(sw_batch_size)
        variables = {"params": self.g_state.params,
                     "batch_stats": self.g_state.batch_stats}

        def predict_fn(batch):
            pred = run(batch["input"], variables)
            return M.postprocess_prediction_jax(pred, batch["gt"][..., 1:2],
                                                scale=self.val_scale)

        return evaluate_dose_model(predict_fn, test_ds, with_ivs=with_ivs,
                                   plots_dir=plots_dir)

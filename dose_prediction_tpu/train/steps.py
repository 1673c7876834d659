"""jit-compiled train/eval step factories — the TPU replacement for the
reference's Lightning training_step/validation_step methods.

Each factory closes over a flax model + optax transformation and returns pure
functions suitable for jax.jit (and for pjit over a mesh: the caller supplies
shardings; the step itself is mesh-agnostic SPMD code).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dose_prediction_tpu.data.packed import unpack_dose_batch
from dose_prediction_tpu.evaluation.metrics import dose_score_jax, postprocess_prediction_jax
from dose_prediction_tpu.train import losses as L
from dose_prediction_tpu.train.state import TrainState, update_moving_loss


def make_pyfer_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    delta1: float = 10.0,
    delta2: float = 8.0,
    freeze: bool = True,
    donate: bool = True,
    remat: bool = False,
    packed: bool = False,
):
    """DOSE-PYFER step (train_light_pyfer.py:122-143): GenLoss deep supervision
    over the cascade output, frozen net_A by default.

    ``remat=True`` rematerializes the forward during backprop
    (jax.checkpoint), trading ~⅓ more FLOPs for activation memory — enables
    larger batches / volumes than the 16 GB HBM otherwise allows.

    ``packed=True`` takes the bit-packed feed (data/packed.py) and unpacks +
    augments it on device at the top of the step — 6× less H2D payload and
    zero host-side augmentation work.
    """

    def apply_fn(params, batch_stats, x):
        # freeze ⇒ stop_gradient at the cascade handoff: net_A's backward and
        # activation storage vanish (requires_grad=False parity; the optax
        # freeze mask alone would compute-then-zero those grads)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
            stop_gradient_a=freeze,
        )

    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def loss_fn(params, batch_stats, batch):
        (pred_a, preds_b), updates = apply_fn(params, batch_stats, batch["input"])
        loss = L.gen_loss(
            (pred_a, preds_b), batch["gt"],
            delta1=delta1, delta2=delta2, cascade=True, freeze=freeze,
        )
        return loss, updates["batch_stats"]

    def step(state: TrainState, batch: Dict[str, jax.Array]) -> Tuple[TrainState, jax.Array]:
        if packed:
            batch = unpack_dose_batch(batch)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            moving_loss=update_moving_loss(state.moving_loss, loss),
        )
        return new_state, loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_pyfer_eval_step(model):
    """Validation step (train_light_pyfer.py:154-174): full-volume forward,
    val loss on the full-res head, and the ×70 masked dose score."""

    @jax.jit
    def step(state: TrainState, batch: Dict[str, jax.Array]):
        (pred_a, preds_b), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["input"], train=False, mutable=["batch_stats"],
        )
        pred = preds_b[0]
        gt = batch["gt"]
        mask = gt[..., 1:2]
        post = postprocess_prediction_jax(pred, mask)
        # batched validation (a dp mesh scores several patients per program):
        # per-sample metrics, reduced with the pad-row validity weights to
        # REPLICATED scalars — safe to read on every host of a multi-host
        # run. This trace returns ONLY the scalars: the full-volume
        # prediction is dead weight on the hot validation path.
        valid = batch.get("valid")
        if valid is not None:
            v = valid.astype(jnp.float32)
            per_loss = L.masked_l1_per_sample(pred, gt[..., 0:1], mask)
            per_score = L.masked_l1_per_sample(post, 70.0 * gt[..., 0:1], mask)
            n = jnp.maximum(jnp.sum(v), 1.0)
            return {"val_loss_mean": jnp.sum(per_loss * v) / n,
                    "dose_score_mean": jnp.sum(per_score * v) / n,
                    "n_valid": jnp.sum(v)}
        loss = L.gen_loss(pred, gt, mode="val")
        score = dose_score_jax(post, 70.0 * gt[..., 0:1], mask)
        return {"val_loss": loss, "dose_score": score, "prediction": post}

    return step


def make_cascade_c3d_train_step(model, tx: optax.GradientTransformation, *,
                                freeze: bool = False, packed: bool = False):
    """C3D baseline step (train_light_c3d.py): plain masked-L1 cascade Loss."""

    def loss_fn(params, batch):
        pred_a, pred_b = model.apply({"params": params}, batch["input"])
        return L.cascade_l1_loss(pred_a, pred_b, batch["gt"], freeze=freeze)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        if packed:
            batch = unpack_dose_batch(batch)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt,
            moving_loss=update_moving_loss(state.moving_loss, loss),
        )
        return new_state, loss

    return step


def make_simple_dose_train_step(model, tx: optax.GradientTransformation,
                                loss_kind: str = "l1", *, packed: bool = False):
    """Single-headed dose models (HD-UNet): masked L1 on the lone output
    (train_light_hdunet.py, Loss(casecade=False))."""

    def loss_fn(params, batch):
        pred = model.apply({"params": params}, batch["input"])
        gt = batch["gt"]
        return L.masked_l1(pred, gt[..., 0:1], gt[..., 1:2])

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        if packed:
            batch = unpack_dose_batch(batch)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt,
            moving_loss=update_moving_loss(state.moving_loss, loss),
        )
        return new_state, loss

    return step


def make_transeg_train_step(model, tx: optax.GradientTransformation):
    """OAR-TranSeg step (train_light_transeg.py:193-198): DiceCE on 96³ crops.
    batch: {'ct': (N,96,96,96,1), 'labels': (N,96,96,96) integer — uint8 on
    the wire (pipeline.seg_batches), widened to int32 on device here}."""

    def loss_fn(params, batch_stats, batch):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["ct"], train=True, mutable=["batch_stats"],
        )
        labels = batch["labels"].astype(jnp.int32)
        return L.dice_ce_loss(logits, labels), updates["batch_stats"]

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats,
            opt_state=new_opt,
            moving_loss=update_moving_loss(state.moving_loss, loss),
        )
        return new_state, loss

    return step


def make_deep_supervision_train_step(model, tx: optax.GradientTransformation, *,
                                     delta1: float = 10.0, delta2: float = 8.0,
                                     huber: bool = False, cascade: bool = False,
                                     packed: bool = False):
    """Experimental-zoo step (train_light_exp_models.py:193): any model
    returning a deep-supervision output list trains with the non-cascade
    GenLoss (Huber optional). batch_stats-carrying models supported."""

    def loss_fn(params, batch_stats, batch):
        outs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["input"], train=True, mutable=["batch_stats"])
        loss = L.gen_loss(outs, batch["gt"], delta1=delta1, delta2=delta2,
                          cascade=cascade, huber=huber)
        return loss, updates["batch_stats"]

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        if packed:
            batch = unpack_dose_batch(batch)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats,
            opt_state=new_opt,
            moving_loss=update_moving_loss(state.moving_loss, loss),
        )
        return new_state, loss

    return step


def make_dosegan_train_steps(
    generator,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    *,
    l1_weight: float = 100.0,
    packed: bool = False,
):
    """DoseGAN alternating G/D steps (train_light_dosegan.py:111-142):
    D: BCE(real→1) + BCE(fake→0);  G: BCE(fake→1) + λ·masked-L1.

    States are separate TrainStates for G and D; a single call runs one D
    update then one G update (the Lightning optimizer_idx loop collapsed into
    one jit program so XLA can overlap both back-props).
    """

    def g_apply(gp, gs, x):
        return generator.apply({"params": gp, "batch_stats": gs}, x,
                               train=True, mutable=["batch_stats"])

    def d_apply(dp, ds, x):
        return discriminator.apply({"params": dp, "batch_stats": ds}, x,
                                   train=True, mutable=["batch_stats"])

    def d_loss_fn(dp, d_stats, g_state, batch):
        # the reference critic is UNCONDITIONAL: it sees only the dose volume
        # (netD(real_out) / netD(fake.detach()), train_light_dosegan.py:131-136)
        gt_dose, mask = batch["gt"][..., 0:1], batch["gt"][..., 1:2]
        fake, _ = g_apply(g_state.params, g_state.batch_stats, batch["input"])
        real_logits, upd = d_apply(dp, d_stats, gt_dose)
        fake_logits, upd2 = d_apply(dp, upd["batch_stats"], fake)
        loss = 0.5 * (L.bce_with_logits(real_logits, jnp.ones_like(real_logits))
                      + L.bce_with_logits(fake_logits, jnp.zeros_like(fake_logits)))
        return loss, upd2["batch_stats"]

    def g_loss_fn(gp, g_stats, d_state, batch):
        gt_dose, mask = batch["gt"][..., 0:1], batch["gt"][..., 1:2]
        fake, upd = g_apply(gp, g_stats, batch["input"])
        fake_logits, _ = d_apply(d_state.params, d_state.batch_stats, fake)
        adv = L.bce_with_logits(fake_logits, jnp.ones_like(fake_logits))
        recon = L.masked_l1(fake, gt_dose, mask)
        return adv + l1_weight * recon, upd["batch_stats"]

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(g_state: TrainState, d_state: TrainState, batch):
        if packed:
            batch = unpack_dose_batch(batch)
        (d_loss, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state.params, d_state.batch_stats, g_state, batch)
        d_updates, d_opt = d_tx.update(d_grads, d_state.opt_state, d_state.params)
        d_state = d_state.replace(
            step=d_state.step + 1,
            params=optax.apply_updates(d_state.params, d_updates),
            batch_stats=d_stats, opt_state=d_opt,
            moving_loss=update_moving_loss(d_state.moving_loss, d_loss),
        )
        (g_loss, g_stats), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params, g_state.batch_stats, d_state, batch)
        g_updates, g_opt = g_tx.update(g_grads, g_state.opt_state, g_state.params)
        g_state = g_state.replace(
            step=g_state.step + 1,
            params=optax.apply_updates(g_state.params, g_updates),
            batch_stats=g_stats, opt_state=g_opt,
            moving_loss=update_moving_loss(g_state.moving_loss, g_loss),
        )
        return g_state, d_state, {"g_loss": g_loss, "d_loss": d_loss}

    return step

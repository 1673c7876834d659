"""Training losses with reference-parity semantics, in static-shape masked form.

The reference boolean-indexes tensors with ``mask > 0`` and takes a mean
(DosePrediction/Train/loss.py); on TPU that is a dynamic shape, so every loss
here is the algebraically identical ``sum(err * mask) / sum(mask)`` with
static shapes. All reductions run in float32.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from dose_prediction_tpu.ops.resize import downsample_pyramid


def _masked_mean(err: jax.Array, mask: jax.Array) -> jax.Array:
    err = err.astype(jnp.float32)
    m = (mask > 0).astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_l1(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean |pred − gt| over mask>0 voxels (loss.py:22-27)."""
    return _masked_mean(jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32)), mask)


def masked_l1_per_sample(pred: jax.Array, gt: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """Per-sample masked mean |pred − gt| → (B,). The batched-validation
    primitive: a dp mesh scores a whole batch of val patients in one program,
    and the mean over samples equals the reference's per-patient sweep."""
    err = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    m = (mask > 0).astype(jnp.float32)
    axes = tuple(range(1, err.ndim))
    return jnp.sum(err * m, axis=axes) / jnp.maximum(jnp.sum(m, axis=axes), 1.0)


def masked_huber(pred: jax.Array, gt: jax.Array, mask: jax.Array, delta: float = 0.5) -> jax.Array:
    """torch.nn.HuberLoss(delta=0.5) over masked voxels (loss.py:53)."""
    d = pred.astype(jnp.float32) - gt.astype(jnp.float32)
    ad = jnp.abs(d)
    err = jnp.where(ad < delta, 0.5 * d * d, delta * (ad - 0.5 * delta))
    return _masked_mean(err, mask)


def cascade_l1_loss(
    pred_a: jax.Array,
    pred_b: jax.Array,
    gt: jax.Array,
    *,
    freeze: bool = True,
) -> jax.Array:
    """The plain cascade Loss (loss.py:7-41): GT is (dose, mask) stacked on the
    channel axis; when net_A is unfrozen its head gets a 0.5-weighted L1."""
    gt_dose, mask = gt[..., 0:1], gt[..., 1:2]
    loss = masked_l1(pred_b, gt_dose, mask)
    if not freeze:
        loss = 0.5 * masked_l1(pred_a, gt_dose, mask) + loss
    return loss


def gen_loss(
    predictions,
    gt: jax.Array,
    *,
    delta1: float = 10.0,
    delta2: float = 1.0,
    mode: str = "train",
    cascade: bool = False,
    freeze: bool = True,
    huber: bool = False,
) -> jax.Array:
    """The DOSE-PYFER deep-supervision loss (GenLoss, loss.py:50-119).

    Args:
        predictions: in train+cascade mode ``(pred_A, [B_full, B½, B¼, B⅛])``;
            in train non-cascade mode the list of B outputs; in val/test mode a
            single full-resolution prediction.
        gt: ``(N, D, H, W, 2)`` — dose (÷70-normalized) and possible_dose_mask.
    """
    gt_dose, mask = gt[..., 0:1], gt[..., 1:2]
    if mode != "train":
        pred = predictions
        if huber:
            return masked_huber(pred, gt_dose, mask) + masked_l1(pred, gt_dose, mask)
        return masked_l1(pred, gt_dose, mask)

    if cascade:
        pred_a, preds_b = predictions
    else:
        pred_a, preds_b = None, predictions
    pred_full = preds_b[0]
    pred_intermediate = preds_b[1:]

    gt_pyr, mask_pyr = downsample_pyramid(gt_dose, mask, levels=(2, 4, 8))
    l_ds = jnp.float32(0.0)
    for pred_i, gt_i, mask_i in zip(pred_intermediate, gt_pyr, mask_pyr):
        l_ds = l_ds + masked_l1(pred_i, gt_i, mask_i)
    l_ds = l_ds / len(pred_intermediate)

    if huber:
        l_pre = masked_huber(pred_full, gt_dose, mask)
    else:
        l_pre = masked_l1(pred_full, gt_dose, mask)

    loss = delta1 * l_pre + delta2 * l_ds
    if cascade and not freeze:
        loss = loss + 0.5 * masked_l1(pred_a, gt_dose, mask)
    return loss


def disc_hinge_loss(real_valid: jax.Array, fake_valid: jax.Array) -> jax.Array:
    """Hinge discriminator loss (DiscLoss, loss.py:44-47)."""
    return (
        jnp.mean(jax.nn.relu(1.0 - real_valid.astype(jnp.float32)))
        + jnp.mean(jax.nn.relu(1.0 + fake_valid.astype(jnp.float32)))
    )


def gan_loss(logits: jax.Array, target_is_real: bool, *, use_lsgan: bool = True) -> jax.Array:
    """GANLoss (dosegan.py:12-46): MSE against 1/0 labels (LSGAN) or BCE."""
    target = jnp.float32(1.0 if target_is_real else 0.0)
    x = logits.astype(jnp.float32)
    if use_lsgan:
        return jnp.mean(jnp.square(x - target))
    p = jax.nn.sigmoid(x)
    eps = 1e-12
    return -jnp.mean(target * jnp.log(p + eps) + (1 - target) * jnp.log(1 - p + eps))


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """torch BCEWithLogitsLoss (train_light_dosegan.py generator/disc loss)."""
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss on NDHWC logits vs integer labels (N,D,H,W)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(ll)


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    include_background: bool = True,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
) -> jax.Array:
    """MONAI DiceLoss(to_onehot_y=True, softmax=True) semantics: soft dice per
    (batch, class) over spatial dims, then mean."""
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), n_classes, dtype=jnp.float32)
    if not include_background:
        probs, onehot = probs[..., 1:], onehot[..., 1:]
    axes = tuple(range(1, probs.ndim - 1))
    inter = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    dice = 1.0 - (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(dice)


def dice_ce_loss(logits: jax.Array, labels: jax.Array, *,
                 lambda_dice: float = 1.0, lambda_ce: float = 1.0) -> jax.Array:
    """MONAI DiceCELoss(to_onehot_y=True, softmax=True) — the TranSeg loss
    (train_light_transeg.py:148)."""
    return lambda_dice * dice_loss(logits, labels) + lambda_ce * softmax_cross_entropy(logits, labels)

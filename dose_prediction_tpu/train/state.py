"""Train state, optimizers, freeze masks, and LR schedules.

Replaces the reference's NetworkTrainer/Lightning optimizer plumbing
(NetworkTrainer/network_trainer.py:107-153, train_light_pyfer.py:194-197)
with optax. Freezing net_A (train_light_pyfer.py:85-88) becomes an
optax.multi_transform whose labels are derived from parameter paths —
the same subtree surface a torch ``requires_grad=False`` loop touches.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA of the train loss (eps 0.01, network_trainer.py:162-168)
    moving_loss: jnp.ndarray


def create_train_state(variables: Dict, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        moving_loss=jnp.array(jnp.nan, jnp.float32),
    )


# ---------------------------------------------------------------------------
# freeze masks
# ---------------------------------------------------------------------------

def label_params_by_path(
    params: Any, frozen_if: Callable[[Tuple[str, ...]], bool]
) -> Any:
    """Label each param leaf 'frozen' / 'trainable' from its key path."""

    def label(path, _leaf):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        return "frozen" if frozen_if(keys) else "trainable"

    return jax.tree_util.tree_map_with_path(label, params)


def cascade_freeze_labels(params: Any) -> Any:
    """Freeze the pretrained cascade stage: any path under net_A or conv_out_A
    (train_light_pyfer.py:85-88)."""
    return label_params_by_path(
        params, lambda keys: any(k in ("net_A", "conv_out_A") for k in keys)
    )


def make_optimizer(
    *,
    learning_rate: float | optax.Schedule,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    freeze_labels: Optional[Any] = None,
    grad_clip_norm: Optional[float] = None,
    kind: str = "adamw",
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """Adam with decoupled weight decay applied torch-style.

    kind='adamw' maps the reference's Adam8bit(weight_decay=wd) onto
    optax.adamw; kind='adam8bit' uses the framework's block-wise int8
    optimizer (train/adam8bit.py — the true bnb analogue, ~3.5× less
    optimizer-state HBM). With ``freeze_labels`` the frozen subtree gets zero
    updates (optax.set_to_zero), exactly mirroring requires_grad=False.

    ``grad_accum=k`` wraps the transform in optax.MultiSteps: gradients are
    averaged over k micro-batches before one optimizer update — effective
    batch k× at micro-batch memory (the 16 GB HBM caps the flagship at
    batch 2; accumulation is the path to larger effective batches).
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if kind == "adam8bit":
        from dose_prediction_tpu.train.adam8bit import adam8bit

        chain.append(adam8bit(learning_rate, b1=b1, b2=b2, eps=eps,
                              weight_decay=weight_decay))
    elif weight_decay:
        chain.append(optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(learning_rate, b1=b1, b2=b2, eps=eps))
    tx = optax.chain(*chain)
    if freeze_labels is not None:
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, freeze_labels
        )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def make_split_lr_optimizer(
    *,
    lr_encoder: float | optax.Schedule,
    lr_decoder: float | optax.Schedule,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    encoder_key: str = "encoder",
) -> optax.GradientTransformation:
    """Split encoder/decoder learning rates (NetworkTrainer.set_optimizer,
    network_trainer.py:110-118): params under any path component containing
    ``encoder_key`` get lr_encoder, the rest lr_decoder."""

    def make(lr):
        if weight_decay:
            return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
        return optax.adam(lr, b1=b1, b2=b2, eps=eps)

    def label_fn(params):
        return label_params_by_path(
            params, lambda keys: any(encoder_key in k for k in keys)
        )

    # label_params_by_path labels 'frozen' when predicate true; rename here
    def relabel(params):
        tree = label_fn(params)
        return jax.tree.map(lambda l: "enc" if l == "frozen" else "dec", tree)

    return optax.multi_transform(
        {"enc": make(lr_encoder), "dec": make(lr_decoder)}, relabel
    )


# ---------------------------------------------------------------------------
# LR schedules (NetworkTrainer.set_lr_scheduler parity, network_trainer.py:127-153)
# ---------------------------------------------------------------------------

def multistep_schedule(base_lr: float, milestones: Sequence[int], gamma: float = 0.1) -> optax.Schedule:
    """torch MultiStepLR: multiply by gamma at each milestone step."""
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def cosine_schedule(base_lr: float, t_max: int, eta_min: float = 0.0) -> optax.Schedule:
    """torch CosineAnnealingLR over t_max steps."""

    def sched(step):
        t = jnp.clip(step, 0, t_max).astype(jnp.float32)
        return eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t / t_max))

    return sched


def make_plateau_optimizer(
    *,
    base_lr: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam(W) with a runtime-adjustable learning rate: inject_hyperparams
    stores the lr inside the optimizer state, so a host-side
    ReduceLROnPlateau can rewrite it between steps (via set_learning_rate)
    WITHOUT retracing the jitted train step — the reference's per-epoch
    scheduler.step(val) path (network_trainer.py:137-153)."""
    if weight_decay:
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=base_lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=base_lr, b1=b1, b2=b2, eps=eps)


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Return a copy of ``opt_state`` with every injected 'learning_rate'
    hyperparameter replaced by ``lr``. Descends namedtuples, tuples, AND dict
    children (optax.multi_transform stores inner states in a dict — a plateau
    optimizer composed with a freeze mask must still be reachable). Raises if
    no injected learning_rate was found: silently returning the state
    unchanged would freeze the lr forever."""
    replaced = [0]

    def walk(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            new_hp = dict(hp)
            old = jnp.asarray(hp["learning_rate"])
            new_hp["learning_rate"] = jnp.asarray(lr, old.dtype)
            replaced[0] += 1
            return node._replace(hyperparams=new_hp)
        if hasattr(node, "_fields") and hasattr(node, "_replace"):  # namedtuple
            return node._replace(**{f: walk(getattr(node, f)) for f in node._fields})
        if isinstance(node, tuple):
            return tuple(walk(c) for c in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    out = walk(opt_state)
    if not replaced[0]:
        raise ValueError(
            "set_learning_rate: no injected 'learning_rate' hyperparameter in "
            "this optimizer state (build it with make_plateau_optimizer / "
            "optax.inject_hyperparams)")
    return out


def get_learning_rate(opt_state: Any) -> Optional[float]:
    """Read back the first injected learning rate (None if not injectable)."""
    found: list = []

    def walk(node):
        if found:
            return
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            found.append(float(hp["learning_rate"]))
            return
        if hasattr(node, "_fields"):
            for f in node._fields:
                walk(getattr(node, f))
        elif isinstance(node, tuple):
            for c in node:
                walk(c)
        elif isinstance(node, dict):
            for c in node.values():
                walk(c)

    walk(opt_state)
    return found[0] if found else None


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics: factor, patience, min on
    the monitored value). Produces a scale factor consumed by
    optax.inject_hyperparams or a fresh jit of the step fn."""

    def __init__(self, *, factor: float = 0.5, patience: int = 10,
                 mode: str = "min", min_lr: float = 0.0, base_lr: float = 1e-3):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.min_lr = min_lr
        self.lr = base_lr
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def step(self, value: float) -> float:
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best)
            or (self.mode == "max" and value > self.best)
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def update_moving_loss(moving: jnp.ndarray, loss: jnp.ndarray, eps: float = 0.01) -> jnp.ndarray:
    """EMA train loss (eps_train_loss=0.01, network_trainer.py:162-168)."""
    return jnp.where(jnp.isnan(moving), loss, (1 - eps) * moving + eps * loss)

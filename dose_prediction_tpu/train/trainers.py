"""Task trainers — the L5 layer (SURVEY.md §2.7) as plain epoch loops over
jit-compiled steps.

Each trainer mirrors one reference Lightning entry point:
- PyferTrainer      ← train_light_pyfer.py   (flagship; frozen net_A cascade,
                      GenLoss δ1=10 δ2=8, val every 5 epochs on dose score,
                      best-ckpt on mean_dose_score=max)
- CascadeC3DTrainer ← train_light_c3d.py     (plain masked-L1 cascade)
- HDUNetTrainer     ← train_light_hdunet.py
- TranSegTrainer    ← OARSegmentation/train_light_transeg.py (DiceCE on 96³
                      crops; sliding-window val with Dice + HD95)
- DoseGANTrainer    ← train_light_dosegan.py (alternating G/D)

Hyperparameter defaults are the reference's tuned values
(train_light_pyfer.py:293-300).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dose_prediction_tpu.core import checkpoint as C
from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.pipeline import (
    device_prefetch,
    dose_batches,
    host_to_global,
    seg_batches,
)
from dose_prediction_tpu.evaluation import metrics as M
from dose_prediction_tpu.infer.sliding_window import make_sliding_window_fn
from dose_prediction_tpu.models import (
    CascadeC3D,
    DosePyfer,
    HDUNet,
    NLayerDiscriminator,
    TranSeg,
    UnetGenerator3D,
)
from dose_prediction_tpu.train import state as S
from dose_prediction_tpu.train import steps as STEP
from dose_prediction_tpu.utils.logging import EpochTimer, MetricLogger


@dataclasses.dataclass
class TrainConfig:
    """Shared loop knobs (reference defaults cited per field)."""

    max_epochs: int = 1300           # train_light_pyfer.py:104
    check_val: int = 5               # :105
    batch_size: int = 1              # config.py:15
    learning_rate: float = 0.0006130697604327541   # :296 (tuned)
    weight_decay: float = 0.00016303111017674179   # :297 (tuned)
    delta1: float = 10.0             # main(delta1=10)
    delta2: float = 8.0              # main(delta2=8)
    freeze_net_a: bool = True
    optimizer: str = "adamw"         # 'adamw' | 'adam8bit' (bnb Adam8bit analogue)
    seed: int = 0
    ckpt_dir: str = "checkpoints"
    log_dir: str = "logs"
    max_steps: Optional[int] = None  # early stop for smoke runs
    # SPMD scale-out (replaces nn.DataParallel, network_trainer.py:104):
    # e.g. {'data': 4} for dp or {'data': 4, 'model': 2} for dp×tp. None =
    # single chip. batch_size must be divisible by the 'data' axis.
    mesh_shape: Optional[Dict[str, int]] = None
    # 'bfloat16' routes the dose feed through the fused native augmentation
    # (one C++ gather pass + bf16 cast: 5× host-side, half the H2D payload —
    # docs/PERFORMANCE.md). 'packed' ships bit-packed masks + bf16 scalars
    # (6 B/voxel vs 36) and unpacks + augments ON DEVICE inside the jit step
    # (data/packed.py) — the strongest answer to a slow host↔device link.
    feed_dtype: str = "float32"      # 'float32' | 'bfloat16' | 'packed'
    # archival snapshot cadence: every N epochs write a never-rotated
    # 'iter_<global_step>' checkpoint slot alongside best/last
    # (NetworkTrainer save_per_epoch → 'iter_' slots,
    # network_trainer.py:304-307). None = no archival snapshots.
    save_per_epoch: Optional[int] = None
    # legacy-loader epoch sizing: an epoch of exactly N samples, cycling
    # through the (shuffled) cohort with wraparound when N exceeds it
    # (MyDataset.__getitem__, dataloader_OpenKBP_C3D.py:117-143). None =
    # one pass over the cohort per epoch.
    samples_per_epoch: Optional[int] = None
    # gradient accumulation: average k micro-batch gradients per optimizer
    # update (optax.MultiSteps) — effective batch k·batch_size at micro-batch
    # memory (HBM caps the 128³ flagship at device batch 2)
    grad_accum: int = 1
    # per-block rematerialization in the flagship decoder (models/dose_pyfer.py
    # remat_blocks): ~⅓ more decoder FLOPs for much lower activation memory —
    # the enabler for device batch ≥3 at 128³ on 16 GB HBM
    remat_blocks: bool = False
    # write a jax.profiler trace of the FIRST training epoch to this directory
    # (TensorBoard/XProf-readable; SURVEY §5.1 — no-op on backends without
    # profiler support, e.g. some remote tunnels)
    profile_dir: Optional[str] = None
    # C3D optimizer/scheduler selection (train_light_c3d.py:179-243 /
    # network_trainer.py:110-153). lr_encoder/lr_decoder give the encoder and
    # decoder parameter groups separate rates; scheduler picks the LR policy.
    # Schedule horizons (milestones, t_max) are in optimizer STEPS — torch
    # steps its schedulers per epoch, optax per update; pass
    # epochs×steps_per_epoch for exact parity.
    lr_encoder: Optional[float] = None
    lr_decoder: Optional[float] = None
    scheduler: Optional[str] = None       # 'multistep' | 'cosine' | 'plateau'
    milestones: Sequence[int] = ()        # multistep boundaries (steps)
    gamma: float = 0.1                    # multistep decay factor
    t_max: Optional[int] = None           # cosine horizon (steps)
    eta_min: float = 0.0                  # cosine floor


def _build_mesh(mesh_shape):
    from dose_prediction_tpu.parallel import mesh as PM

    total = int(np.prod(list(mesh_shape.values())))
    if jax.process_count() > 1 and total != len(jax.devices()):
        # a partial slice of the global device list would concentrate the
        # mesh on the first host(s) and break per-process batch sharding
        raise ValueError(
            f"multi-host runs must mesh over ALL devices: mesh {mesh_shape} "
            f"covers {total} of {len(jax.devices())} global devices")
    return PM.create_mesh(dict(mesh_shape), devices=jax.devices()[:total])


def _sharded_state(variables, tx, mesh, *, tp_rules=None):
    """TrainState with rule-sharded params (Megatron tp where rules match,
    replicated otherwise); optimizer moments inherit through tx.init;
    batch_stats replicated."""
    from dose_prediction_tpu.parallel import mesh as PM

    rules = PM.VIT_TP_RULES if tp_rules is None else tp_rules
    p_shard = PM.param_shardings(variables["params"], mesh, rules)
    params = jax.tree.map(jax.device_put, variables["params"], p_shard)
    repl = PM.replicated(mesh)
    stats = jax.tree.map(lambda a: jax.device_put(a, repl),
                         variables.get("batch_stats", {}))
    return S.create_train_state({"params": params, "batch_stats": stats}, tx)


def _init_state_with_mesh(variables, tx, mesh_shape, *, tp_rules=None):
    """Create the TrainState, sharded over a mesh when one is configured.

    Params get rule-based shardings (Megatron tp on the ViT where the rules
    match, replicated otherwise); the optimizer moments inherit them through
    tx.init; batch_stats are replicated. Returns
    (state, mesh, batch_sharding, replicated_sharding) — the last two feed
    device_prefetch so train batches shard over 'data' and full-volume val
    batches replicate. GSPMD inserts the gradient psum over ICI; the step
    functions stay mesh-agnostic.
    """
    if not mesh_shape:
        return S.create_train_state(variables, tx), None, None, None
    from dose_prediction_tpu.parallel import mesh as PM

    mesh = _build_mesh(mesh_shape)
    state = _sharded_state(variables, tx, mesh, tp_rules=tp_rules)
    return state, mesh, PM.batch_sharding(mesh), PM.replicated(mesh)


def _init_gan_states_with_mesh(g_vars, d_vars, g_tx, d_tx, mesh_shape, *,
                               g_tp_rules=None, d_tp_rules=()):
    """Two-state (G/D) analogue of _init_state_with_mesh: both nets shard over
    the SAME mesh (generator may carry ViT tp rules; discriminators are
    conv/resnet stacks → replicated params, dp only). Returns
    (g_state, d_state, mesh, batch_sharding, replicated_sharding)."""
    if not mesh_shape:
        return (S.create_train_state(g_vars, g_tx),
                S.create_train_state(d_vars, d_tx), None, None, None)
    from dose_prediction_tpu.parallel import mesh as PM

    mesh = _build_mesh(mesh_shape)
    g_state = _sharded_state(g_vars, g_tx, mesh, tp_rules=g_tp_rules)
    d_state = _sharded_state(d_vars, d_tx, mesh, tp_rules=d_tp_rules)
    return g_state, d_state, mesh, PM.batch_sharding(mesh), PM.replicated(mesh)


def _check_mesh_batch(cfg: TrainConfig, mesh) -> None:
    if mesh is not None and cfg.batch_size % mesh.shape["data"]:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by the 'data' mesh "
            f"axis ({mesh.shape['data']})")


def _timed_batches(iterator, timer: EpochTimer, bucket: str = "loader"):
    """Attribute per-batch host fetch/augment/H2D wait to the loader bucket
    (TrainerTime parity: the reference times the batch fetch itself,
    network_trainer.py:186-191 — not generator construction)."""
    it = iter(iterator)
    while True:
        timer.tick()
        try:
            batch = next(it)
        except StopIteration:
            timer._t0 = None
            return
        timer.tock(bucket)
        yield batch


def _feed_rows(batch_sharding):
    """(process_index, process_count) when each host should build only ITS
    rows of the global batch — multi-host dp with a sharded train feed — else
    None (single process, or an unsharded feed where slicing would silently
    desynchronize the replicas). Pass the result to the batch builders'
    ``process_rows`` and set device_prefetch(local_rows=...) accordingly."""
    if batch_sharding is None or jax.process_count() == 1:
        return None
    return jax.process_index(), jax.process_count()


def _train_batches(cfg: TrainConfig, train_ds, epoch: int, *, drop_last: bool,
                   process_rows=None):
    """Epoch batch source honoring cfg.feed_dtype ('float32' | 'bfloat16' |
    'packed'); the packed feed pairs with step factories built with
    packed=True (data/packed.py). An unpackable dataset (non-binary masks /
    non-integer 70·PTV) degrades to the f32 feed with a warning — the
    packed-built steps pass {'input','gt'} batches through unchanged."""
    if cfg.feed_dtype == "packed":
        from dose_prediction_tpu.data.packed import pack_patient, packed_dose_batches

        patients = getattr(train_ds, "patients", None)
        if patients is not None and all(
                pack_patient(p) is not None for p in patients):
            return packed_dose_batches(
                train_ds, batch_size=cfg.batch_size, seed=cfg.seed + epoch,
                drop_last=drop_last,
                num_samples_per_epoch=cfg.samples_per_epoch,
                process_rows=process_rows)
        print("[feed] dataset not packable (non-binary masks or non-integer "
              "70*PTV); falling back to the float32 feed")
    return dose_batches(train_ds, batch_size=cfg.batch_size,
                        seed=cfg.seed + epoch, drop_last=drop_last,
                        native_bf16=cfg.feed_dtype == "bfloat16",
                        num_samples_per_epoch=cfg.samples_per_epoch,
                        process_rows=process_rows)


def _padded_dose_val_batches(val_ds, val_batch: int):
    """Full-volume validation feed for batched (dp-mesh) validation: fixed
    ``val_batch`` rows per batch (one jit geometry), the tail padded by
    repeating its last patient, plus a 'valid' (B,) weight column marking the
    real rows. Row order matches the batch-1 sweep, so the validity-weighted
    mean equals the reference's per-patient scoring exactly."""
    for batch in dose_batches(val_ds, batch_size=val_batch, shuffle=False,
                              augment=False):
        n = batch["input"].shape[0]
        if n < val_batch:
            pad = val_batch - n
            batch = {k: np.concatenate([v] + [v[-1:]] * pad)
                     for k, v in batch.items()}
        batch["valid"] = (np.arange(val_batch) < n).astype(np.float32)
        yield batch


def _mesh_val_metrics(eval_fn, val_ds, mesh, batch_sharding) -> Dict[str, float]:
    """Batched full-volume validation over a dp mesh: val_batch = the mesh's
    'data' axis, so N replicas each score a different patient per program
    instead of idling N−1 of them on the batch-1 sweep. ``eval_fn(batch)``
    returns replicated scalars (dose_score_mean, val_loss_mean, n_valid) —
    validity-weighted means over the batch. The weighted cohort accumulation
    is bit-equal in exact arithmetic to the per-patient batch-1 sweep
    (train_light_pyfer.py:154-174 semantics)."""
    val_batch = mesh.shape["data"]
    weighted = []  # device triples (score·n, loss·n, n); ONE sync at the end
    for batch in device_prefetch(_padded_dose_val_batches(val_ds, val_batch),
                                 sharding=batch_sharding):
        s, l, n = eval_fn(batch)
        weighted.append((s * n, l * n, n))
    if not weighted:
        return {"mean_dose_score": float("nan"), "val_loss": float("nan")}
    tot = np.asarray(jnp.sum(jnp.asarray(weighted, jnp.float32), axis=0))
    n_tot = max(float(tot[2]), 1.0)
    return {"mean_dose_score": -float(tot[0]) / n_tot,
            "val_loss": float(tot[1]) / n_tot}


def _sliding_val_sweep(run, variables, val_ds, val_loss_fn,
                       val_scale: float) -> Dict[str, float]:
    """Pipelined sliding-window dose validation shared by the ×80-scale
    trainers (Exp / ViT-GAN: train_light_{exp_models,gan}.py:218-247):
    per patient, blended prediction → val loss + masked MAE × val_scale,
    with patient i+1's sweep dispatched before patient i's host scoring."""
    from dose_prediction_tpu.infer.pipeline import pipeline_map

    scores, vlosses = [], []
    # multi-host lockstep sweeps need UNCOMMITTED (numpy) inputs — see
    # TranSegTrainer.validate
    multiproc = jax.process_count() > 1

    def produce(p):
        x = np.ascontiguousarray(p.model_input[None], np.float32)
        gt = np.ascontiguousarray(p.gt[None], np.float32)
        pred_dev = run(x if multiproc else jnp.asarray(x), variables)
        return p, pred_dev, val_loss_fn(
            pred_dev, gt if multiproc else jnp.asarray(gt))

    def consume(staged):
        p, pred_dev, vloss = staged
        vlosses.append(float(vloss))
        pred = np.asarray(pred_dev)[0, ..., 0]
        post = M.postprocess_prediction(pred, p.dose_mask, scale=val_scale)
        scores.append(M.dose_score(post, val_scale * p.dose, p.dose_mask))

    for _ in pipeline_map(produce, consume, val_ds.patients):
        pass
    return {"mean_dose_score": -float(np.mean(scores)),
            "val_loss": float(np.mean(vlosses))}


def _traced_epoch(iterable, log_dir: Optional[str]):
    """Wrap one epoch's batch iteration in a jax.profiler trace when
    ``log_dir`` is set (callers pass cfg.profile_dir for the first epoch
    only). Early loop exits close the trace via GeneratorExit."""
    if not log_dir:
        yield from iterable
        return
    from dose_prediction_tpu.utils.profiling import trace

    with trace(log_dir):
        yield from iterable


def _host_mean(losses: List[jax.Array]) -> float:
    """Mean of an epoch's device loss scalars with ONE host sync at epoch end.
    The reference reads loss.item() every iteration (network_trainer.py:246);
    on a remote TPU backend each device→host read costs ~29 ms (~12% of the
    233 ms flagship step) and partially serializes against device_prefetch —
    so train loops keep the per-step scalars on device and reduce them here."""
    if not losses:
        return float("nan")
    return float(jnp.mean(jnp.stack([jnp.asarray(l) for l in losses])))


# -- preemption-graceful shutdown -------------------------------------------
# Preemptible TPU fleets deliver SIGTERM ahead of eviction. While a fit runs
# (main thread only — handlers cannot be installed from HPO worker threads),
# SIGTERM sets this flag instead of killing the process: every trainer's
# step/epoch loop polls it via _stop_requested(), so the run exits at the
# next batch boundary AFTER the epoch-end 'last' save, and the
# _drains_checkpoints finally-block makes all async writes durable before
# fit returns. The flag resets at each fit entry, so a graceful stop in one
# fit does not poison later fits in the same process (tests, HPO, k-fold).
_SHUTDOWN_REQUESTED = False


def _stop_requested(cfg: TrainConfig, global_step: int) -> bool:
    """True when the fit should end at this boundary: max_steps reached, or
    a SIGTERM arrived (preemption notice)."""
    return _SHUTDOWN_REQUESTED or (
        cfg.max_steps is not None and global_step >= cfg.max_steps)


def _drains_checkpoints(fit_fn):
    """Ensure every async checkpoint write issued during fit is durable when
    fit returns (crash-consistency at the API boundary; also prevents orbax
    commit threads racing interpreter shutdown when a CLI process exits right
    after training). Also installs the graceful-SIGTERM handler for the
    duration of the fit (see _SHUTDOWN_REQUESTED above)."""
    import functools
    import signal

    @functools.wraps(fit_fn)
    def wrapper(self, *args, **kwargs):
        global _SHUTDOWN_REQUESTED
        _SHUTDOWN_REQUESTED = False
        prev_handler = None
        installed = False

        def _on_sigterm(signum, frame):
            global _SHUTDOWN_REQUESTED
            _SHUTDOWN_REQUESTED = True
            print("[trainer] SIGTERM received: finishing the current step, "
                  "saving 'last', draining checkpoints, then exiting",
                  flush=True)

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
            installed = True
        except ValueError:
            pass  # not the main thread (e.g. a concurrent HPO trial)
        try:
            return fit_fn(self, *args, **kwargs)
        finally:
            if installed:
                signal.signal(signal.SIGTERM, prev_handler)
            ckpt = getattr(self, "ckpt", None)
            if ckpt is not None:
                ckpt.wait()

    return wrapper


def _save_epoch_slots(ckpt, cfg: TrainConfig, epoch: int, global_step: int,
                      tree: Dict[str, Any]) -> None:
    """Epoch-end checkpoint slots: the rotating 'last' crash-resume slot
    every epoch, plus a never-rotated 'iter_<global_step>' archival snapshot
    every cfg.save_per_epoch epochs (network_trainer.py:304-307)."""
    if cfg.save_per_epoch and (epoch + 1) % cfg.save_per_epoch == 0:
        ckpt.save_snapshot(global_step, tree)
    ckpt.save_last(tree)


def _resume_guard_config(cfg: TrainConfig, *models) -> Dict[str, Any]:
    """The graph-determining settings a resumed run MUST match: the optimizer
    family (opt_state structure — e.g. adam8bit's int8/uint8 moments) and
    every model-constructor field (act, block_family, k7_mode, sizes — the
    params restore act-independently, so a flipped default would otherwise
    train/serve silently with the wrong graph). Learning rate / wd / horizons
    are deliberately NOT pinned: retuning them across resumes is a legitimate
    reference workflow (train_light_pyfer.py:343-347)."""
    from dose_prediction_tpu.infer import aot as AOT

    return {"optimizer": cfg.optimizer,
            "models": [{"model": type(m).__name__,
                        "config": AOT.model_spec(m)} for m in models]}


def _try_resume(ckpt: "C.CheckpointManager", template: Dict[str, Any],
                run_config: Optional[Dict[str, Any]] = None):
    """Shared resume policy (every trainer's ckpt_path='last.ckpt' analogue,
    e.g. train_light_hdunet.py:296, train_light_dosegan.py:349): prefer the
    every-epoch 'last' slot (at least as fresh as monitored saves), fall back
    to the newest monitored/legacy checkpoint. A corrupt/partial slot (e.g. a
    crash mid-write on a filesystem without atomic rename) degrades to the
    next candidate instead of killing the run. Returns
    (tree|None, start_epoch).

    Safety: when the checkpoint directory holds work that the current
    configuration CANNOT continue — the recorded run_config sidecar differs
    on a graph-determining knob, or checkpoints exist but none restore
    against the current state template — this raises instead of silently
    starting fresh (which would rotate the old slots away). Set
    ``DPT_FRESH_ON_MISMATCH=1`` to discard the old run deliberately."""
    import json
    import os as _os

    fresh_ok = _os.environ.get("DPT_FRESH_ON_MISMATCH") == "1"
    canon = lambda d: json.dumps(d, sort_keys=True, default=str)
    if run_config is not None:
        stored = ckpt.read_run_config()
        if stored is not None and canon(stored) != canon(run_config):
            msg = ("[resume] checkpoint dir was written by a run with "
                   "different graph-determining settings:\n"
                   f"  recorded: {canon(stored)}\n"
                   f"  current:  {canon(run_config)}\n"
                   "Resuming would train/serve a different graph over the "
                   "restored weights (defaults may have changed across "
                   "versions — e.g. pyfer's optimizer adamw→adam8bit, act "
                   "relu→mish). Relaunch with the recorded settings, or set "
                   "DPT_FRESH_ON_MISMATCH=1 to discard the old run.")
            if not fresh_ok:
                raise RuntimeError(msg)
            print(msg + "\n[resume] DPT_FRESH_ON_MISMATCH=1: starting FRESH "
                  "— subsequent saves will overwrite the old slots")
            ckpt.write_run_config(run_config)
            return None, 0
    restored = None
    last_failed = False
    try:
        restored = ckpt.restore_last(template)
    except Exception as e:
        last_failed = True
        print(f"[resume] 'last' slot unreadable ({type(e).__name__}); "
              f"falling back to monitored checkpoints")
    if restored is None:
        try:
            _, restored = ckpt.restore_latest(template)
        except Exception as e:
            print(f"[resume] monitored checkpoints unreadable "
                  f"({type(e).__name__})")
            last_failed = True
    if run_config is not None and (restored is not None or not last_failed):
        ckpt.write_run_config(run_config)
    if restored is None:
        if last_failed:
            # checkpoints EXIST but none matched the current state template —
            # usually an architecture/optimizer change (e.g. the critic's
            # 10ch→1ch fix), not a fresh run. Continuing would overwrite the
            # old slots, so refuse unless explicitly told to discard.
            msg = ("[resume] existing checkpoints could not be restored "
                   "against the current model/optimizer structure "
                   "(architecture or optimizer changed?). Relaunch with the "
                   "settings the run was trained with (e.g. --optimizer "
                   "adamw for flagship runs from before the adam8bit "
                   "default), or set DPT_FRESH_ON_MISMATCH=1 to discard the "
                   "old run and start fresh")
            if not fresh_ok:
                raise RuntimeError(msg)
            print(msg + "\n[resume] DPT_FRESH_ON_MISMATCH=1: starting FRESH")
            if run_config is not None:
                ckpt.write_run_config(run_config)
        return None, 0
    return restored, int(restored["epoch"]) + 1


class PyferTrainer:
    """Flagship DOSE-PYFER trainer."""

    def __init__(self, cfg: TrainConfig, *, model: Optional[DosePyfer] = None,
                 pretrained_c3d_params: Optional[Any] = None,
                 example_shape: Sequence[int] = (1, 128, 128, 128, 9)):
        self.cfg = cfg
        self.model = model if model is not None else DosePyfer(
            remat_blocks=cfg.remat_blocks)
        from dose_prediction_tpu.infer import aot as AOT

        key = jax.random.PRNGKey(cfg.seed)
        example_zeros = lambda: jnp.zeros(example_shape, jnp.float32)
        # freeze labels are path-based — abstract shapes suffice, so the
        # optimizer exists before any device work and state init can be ONE
        # program (model.init + tx.init fused; servable from a shipped AOT
        # executable instead of the minutes-long cold compile)
        var_shapes = jax.eval_shape(self.model.init, key, example_zeros())
        freeze_labels = (S.cascade_freeze_labels(var_shapes["params"])
                         if cfg.freeze_net_a else None)
        self.tx = S.make_optimizer(
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay,
            freeze_labels=freeze_labels, kind=cfg.optimizer,
            grad_accum=cfg.grad_accum)
        if cfg.mesh_shape:
            variables = jax.jit(self.model.init)(key, example_zeros())
            if pretrained_c3d_params is not None:
                params, _ = C.load_pretrained_net_a(variables["params"],
                                                    pretrained_c3d_params)
                variables = {**variables, "params": params}
            self.state, self.mesh, self.batch_sharding, self.val_sharding = \
                _init_state_with_mesh(variables, self.tx, cfg.mesh_shape)
        else:
            init_fn = lambda k: S.create_train_state(
                self.model.init(k, example_zeros()), self.tx)
            self.state = AOT.maybe_init_train_state(
                "pyfer", cfg, self.model, example_shape, init_fn, key)
            if pretrained_c3d_params is not None:
                # surgery after init is exact: fresh optimizer moments are
                # zeros (and their int8 quantization), independent of params
                params, _ = C.load_pretrained_net_a(self.state.params,
                                                    pretrained_c3d_params)
                self.state = self.state.replace(params=params)
            self.mesh = self.batch_sharding = self.val_sharding = None
        self.train_step = STEP.make_pyfer_train_step(
            self.model, self.tx, delta1=cfg.delta1, delta2=cfg.delta2,
            freeze=cfg.freeze_net_a, packed=cfg.feed_dtype == "packed")
        # spec-checked shipped train-step executable (skips the minutes-long
        # cold compile on a fresh runtime session; exact-config match only)
        self.train_step = AOT.maybe_wrap_train_step(
            "pyfer", cfg, self.model, example_shape, self.train_step)
        self.eval_step = STEP.make_pyfer_eval_step(self.model)
        self.logger = MetricLogger(cfg.log_dir, run_name="pyfer")
        self.ckpt = C.CheckpointManager(cfg.ckpt_dir, monitor="mean_dose_score", mode="max")
        self.best_val = -np.inf

    @_drains_checkpoints
    def fit(self, train_ds: OpenKBPDataset, val_ds: Optional[OpenKBPDataset] = None,
            *, resume: bool = True,
            on_validation: Optional[Callable[[int, Dict[str, float]], bool]] = None) -> None:
        """Train. ``on_validation(epoch, metrics) -> stop`` is invoked after
        each validation round (the TuneReportCallback analogue,
        tune_light_pyfer.py:24); returning True aborts the fit — this is how
        ASHA early-stops a trial."""
        cfg = self.cfg
        start_epoch = 0
        if resume:
            # last-slot first, then monitored, degrading past corrupt slots
            # (train_light_pyfer.py:343-347 ckpt_path='last.ckpt')
            restored, start_epoch = _try_resume(
                self.ckpt, {"state": self.state, "epoch": 0},
                run_config=_resume_guard_config(self.cfg, self.model))
            if restored is not None:
                self.state = restored["state"]
                self.logger.log_text(f"resumed from epoch {start_epoch - 1}")
        _check_mesh_batch(cfg, self.mesh)
        timer = EpochTimer()
        global_step = int(self.state.step)
        for epoch in range(start_epoch, cfg.max_epochs):
            timer.reset()
            epoch_losses: List[jax.Array] = []
            it = _timed_batches(device_prefetch(
                _train_batches(cfg, train_ds, epoch,
                               drop_last=self.batch_sharding is not None,
                               process_rows=_feed_rows(self.batch_sharding)),
                sharding=self.batch_sharding,
                local_rows=_feed_rows(self.batch_sharding) is not None), timer)
            from dose_prediction_tpu.utils.profiling import trace
            prof = trace(cfg.profile_dir if epoch == start_epoch else None)
            with prof:
                for batch in it:
                    timer.tick()
                    self.state, loss = self.train_step(self.state, batch)
                    epoch_losses.append(loss)   # device scalar; no per-step sync
                    timer.tock("train")
                    global_step += 1
                    if _stop_requested(cfg, global_step):
                        break
                mean_loss = _host_mean(epoch_losses)
            self.logger.log({"train_mean_loss": mean_loss,
                             "moving_loss": float(self.state.moving_loss)}, epoch + 1)

            if val_ds is not None and (epoch + 1) % cfg.check_val == 0:
                timer.tick()
                if self.mesh is not None and self.mesh.shape["data"] > 1:
                    # dp mesh: score data-axis patients per program
                    vm = _mesh_val_metrics(
                        lambda b: (lambda o: (o["dose_score_mean"],
                                              o["val_loss_mean"],
                                              o["n_valid"]))(
                            self.eval_step(self.state, b)),
                        val_ds, self.mesh, self.batch_sharding)
                    mean_dose_score = vm["mean_dose_score"]
                    mean_vloss = vm["val_loss"]
                else:
                    scores, vlosses = [], []
                    for batch in device_prefetch(dose_batches(
                            val_ds, batch_size=1, shuffle=False, augment=False),
                            sharding=self.val_sharding):
                        out = self.eval_step(self.state, batch)
                        scores.append(float(out["dose_score"]))
                        vlosses.append(float(out["val_loss"]))
                    mean_dose_score = -float(np.mean(scores))  # maximize (:179)
                    mean_vloss = float(np.mean(vlosses))
                timer.tock("val")
                self.logger.log({"mean_dose_score": mean_dose_score,
                                 "val_loss": mean_vloss}, epoch + 1)
                self.best_val = max(self.best_val, mean_dose_score)
                self.ckpt.save(epoch, {"state": self.state, "epoch": epoch},
                               {"mean_dose_score": mean_dose_score})
                if on_validation is not None and on_validation(
                        epoch + 1, {"mean_dose_score": mean_dose_score,
                                    "val_loss": mean_vloss}):
                    self.logger.log_text(f"early-stopped at epoch {epoch + 1}")
                    return
            # crash-resume granularity: every epoch, not just val epochs
            _save_epoch_slots(self.ckpt, cfg, epoch, global_step,
                              {"state": self.state, "epoch": epoch})
            self.logger.log_text(f"epoch {epoch + 1}: {timer.report()}")
            if _stop_requested(cfg, global_step):
                break

    def test(self, test_ds: OpenKBPDataset, *, device_metrics: bool = False,
             plots_dir: Optional[str] = None) -> Dict[str, Any]:
        """OpenKBP scoring sweep (train_light_pyfer.py:199-287): per-patient
        dose score, DVH score, IVS curve. ``device_metrics`` scores on-device
        (no prediction D2H; several× faster sweeps on remote backends).
        ``plots_dir`` dumps per-patient DVH figures and GT/pred/error slice
        triptychs (train_light_pyfer.py:222-263)."""
        results = evaluate_dose_model(
            lambda batch: self.eval_step(self.state, batch)["prediction"],
            test_ds, device_metrics=device_metrics, plots_dir=plots_dir)
        self.logger.log({"mean_dose_metric": results["mean_dose_score"],
                         "std_dose_metric": results["std_dose_score"],
                         "mean_dvh_metric": results["mean_dvh_score"]},
                        int(self.state.step))
        return results


def evaluate_dose_model(predict_fn: Callable[[Dict[str, jax.Array]], jax.Array],
                        ds: OpenKBPDataset, *, with_ivs: bool = True,
                        device_metrics: bool = False,
                        plots_dir: Optional[str] = None,
                        plots_every: int = 8) -> Dict[str, Any]:
    """Shared OpenKBP test-path evaluation (dose + DVH + IVS accumulation,
    evaluate_openKBP.py:149-222). ``predict_fn`` returns the post-processed
    ×70 Gy prediction for a {'input','gt'} batch.

    ``device_metrics=True`` scores each patient in ONE jit program on device
    (sort-based masked percentiles): only scalars cross back to the host —
    no prediction D2H, no per-structure numpy sorts (remote-backend eval
    sweeps get several× faster; numpy-parity tested). Per-structure detail
    values are reported by the host path only. The sweep is software-
    pipelined: patient i+1's forward+scoring programs are dispatched before
    patient i's scalars are read, so the per-patient host sync overlaps the
    next patient's device work (infer.pipeline.pipeline_map).

    ``plots_dir`` writes per-patient DVH comparison figures + GT/pred/error
    slice triptychs (train_light_pyfer.py:222-263; one slice every
    ``plots_every``); it needs host predictions, so it is incompatible with
    ``device_metrics``."""
    from dose_prediction_tpu.infer.pipeline import pipeline_map

    if plots_dir and device_metrics:
        raise ValueError("plots_dir needs host predictions; use device_metrics=False")

    dose_scores, dvh_scores = [], []
    ivs_curves = []
    per_patient: Dict[str, Dict] = {}

    def produce(p):
        batch = {"input": jnp.asarray(p.model_input[None]),
                 "gt": jnp.asarray(p.gt[None])}
        if device_metrics:
            # async dispatch; only the consume step reads scalars
            pred_dev = predict_fn(batch)[0, ..., 0]
            return p, M.patient_scores_device(pred_dev, p, with_ivs=with_ivs,
                                              sync=False)
        return p, predict_fn(batch)

    def consume(staged):
        p, out = staged
        if device_metrics:
            ds_score = float(out["dose_dif"])
            dvh = {"dvh_dif": float(out["dvh_dif"]), "detail": {}}
            if with_ivs:
                ivs_curves.append(np.asarray(out["ivs"]))
        else:
            pred = np.asarray(out)[0, ..., 0]
            ds_score = M.dose_score(pred, p.real_dose, p.dose_mask)
            dvh = M.dvh_score_for_patient(pred, p.real_dose, p.structures, p.spacing)
            if with_ivs:
                ivs_curves.append(M.ivs_sweep(pred, p.real_dose))
            if plots_dir:
                from pathlib import Path

                from dose_prediction_tpu.evaluation.plots import (
                    plot_dvh,
                    save_slice_triptychs,
                )
                plot_dvh(pred, p.real_dose, p.structures,
                         Path(plots_dir) / f"dvh_{p.patient_id}.png")
                save_slice_triptychs(pred, p.real_dose,
                                     Path(plots_dir) / p.patient_id,
                                     every=plots_every)
        dose_scores.append(ds_score)
        if np.isfinite(dvh["dvh_dif"]):
            dvh_scores.append(dvh["dvh_dif"])
        per_patient[p.patient_id] = {"dose_dif": ds_score, "dvh_dif": dvh["dvh_dif"],
                                     **dvh["detail"]}

    for _ in pipeline_map(produce, consume, ds.patients):
        pass
    return {
        "mean_dose_score": float(np.mean(dose_scores)),
        "std_dose_score": float(np.std(dose_scores)),
        "mean_dvh_score": float(np.mean(dvh_scores)) if dvh_scores else float("nan"),
        "ivs": np.mean(np.stack(ivs_curves), axis=0).tolist() if ivs_curves else None,
        "per_patient": per_patient,
    }


class CascadeC3DTrainer:
    """C3D baseline (train_light_c3d.py), masked-L1 cascade loss.

    Optimizer/scheduler selection follows configure_optimizers
    (train_light_c3d.py:179-243): split encoder/decoder learning rates when
    ``cfg.lr_encoder``/``cfg.lr_decoder`` are set (the reference splits
    whenever the model has encoder/decoder attributes — ours always does, so
    the split is opt-in via config), and ``cfg.scheduler`` picks
    multistep ('step'), cosine, or plateau. The plateau monitors
    moving_train_loss per epoch (reference monitor="moving_train_loss",
    :239-241) via optax.inject_hyperparams, so lr updates take effect without
    retracing the train step. Resumes from the every-epoch 'last' slot
    (:372-374 fit(ckpt_path='last.ckpt'))."""

    def __init__(self, cfg: TrainConfig, *, model: Optional[CascadeC3D] = None,
                 example_shape: Sequence[int] = (1, 128, 128, 128, 9),
                 schedule: Optional[Any] = None,
                 plateau: Optional[S.ReduceLROnPlateau] = None):
        self.cfg = cfg
        self.model = model if model is not None else CascadeC3D()
        variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(cfg.seed), jnp.zeros(example_shape, jnp.float32))
        if plateau is None and cfg.scheduler == "plateau":
            plateau = S.ReduceLROnPlateau(base_lr=cfg.learning_rate)
        self.plateau = plateau

        split = cfg.lr_encoder is not None or cfg.lr_decoder is not None

        def sched_of(base_lr):
            if schedule is not None:
                return schedule
            if cfg.scheduler == "multistep":
                return S.multistep_schedule(base_lr, cfg.milestones, cfg.gamma)
            if cfg.scheduler == "cosine":
                return S.cosine_schedule(
                    base_lr, cfg.t_max if cfg.t_max is not None else cfg.max_epochs,
                    cfg.eta_min)
            return base_lr

        if plateau is not None:
            if split:
                raise ValueError("plateau + split encoder/decoder LRs is not "
                                 "supported (single injected lr)")
            plateau.lr = cfg.learning_rate
            self.tx = S.make_plateau_optimizer(
                base_lr=cfg.learning_rate, weight_decay=cfg.weight_decay)
        elif split:
            self.tx = S.make_split_lr_optimizer(
                lr_encoder=sched_of(cfg.lr_encoder if cfg.lr_encoder is not None
                                    else cfg.learning_rate),
                lr_decoder=sched_of(cfg.lr_decoder if cfg.lr_decoder is not None
                                    else cfg.learning_rate),
                weight_decay=cfg.weight_decay)
        else:
            self.tx = S.make_optimizer(learning_rate=sched_of(cfg.learning_rate),
                                       weight_decay=cfg.weight_decay)
        self.state, self.mesh, self.batch_sharding, self.val_sharding = \
            _init_state_with_mesh(variables, self.tx, cfg.mesh_shape, tp_rules=())
        self.train_step = STEP.make_cascade_c3d_train_step(
            self.model, self.tx, packed=cfg.feed_dtype == "packed")
        self.logger = MetricLogger(cfg.log_dir, run_name="c3d")
        self.ckpt = C.CheckpointManager(cfg.ckpt_dir, monitor="mean_dose_score", mode="max")

        @jax.jit
        def predict(params, x):
            _, pred_b = self.model.apply({"params": params}, x)
            return pred_b

        self._predict = predict

    @_drains_checkpoints
    def fit(self, train_ds: OpenKBPDataset, val_ds: Optional[OpenKBPDataset] = None,
            *, resume: bool = True):
        cfg = self.cfg
        _check_mesh_batch(cfg, self.mesh)
        start_epoch = 0
        if resume:
            restored, start_epoch = _try_resume(
                self.ckpt, {"state": self.state, "epoch": 0},
                run_config=_resume_guard_config(self.cfg, self.model))
            if restored is not None:
                self.state = restored["state"]
                self.logger.log_text(f"resumed from epoch {start_epoch - 1}")
        global_step = int(self.state.step)
        # the slot's whole-run-best invariant must survive resume: the loss
        # lives inside the slot tree (the legacy trainer persists
        # best_average_train_loss in its pickled log, network_trainer.py:69)
        best_train_loss = float("inf")
        if resume:
            prev = self.ckpt.restore_named(
                "best_train_loss",
                {"state": self.state, "epoch": 0, "loss": 0.0})
            if prev is not None:
                best_train_loss = float(prev["loss"])
        for epoch in range(start_epoch, cfg.max_epochs):
            losses = []
            for batch in _traced_epoch(device_prefetch(
                    _train_batches(cfg, train_ds, epoch,
                                   drop_last=self.batch_sharding is not None,
                                   process_rows=_feed_rows(self.batch_sharding)),
                    sharding=self.batch_sharding,
                    local_rows=_feed_rows(self.batch_sharding) is not None),
                    cfg.profile_dir if epoch == start_epoch else None):
                self.state, loss = self.train_step(self.state, batch)
                losses.append(loss)
                global_step += 1
                if _stop_requested(cfg, global_step):
                    break
            mean_loss = _host_mean(losses)
            self.logger.log({"train_mean_loss": mean_loss}, epoch + 1)
            # legacy NetworkTrainer 'best_train_loss' slot: saved whenever the
            # epoch-average train loss improves (network_trainer.py:171-175)
            if mean_loss < best_train_loss:
                best_train_loss = mean_loss
                self.ckpt.save_named(
                    "best_train_loss",
                    {"state": self.state, "epoch": epoch,
                     "loss": float(mean_loss)})
            if val_ds is not None and (epoch + 1) % cfg.check_val == 0:
                scores = []
                for batch in dose_batches(val_ds, batch_size=1, shuffle=False, augment=False):
                    x = batch["input"]
                    if self.val_sharding is not None:
                        x = host_to_global(self.val_sharding, x)
                    pred = self._predict(self.state.params, jnp.asarray(x))
                    gt = batch["gt"]
                    post = M.postprocess_prediction(np.asarray(pred)[..., 0], gt[..., 1])
                    scores.append(M.dose_score(post, 70 * gt[..., 0], gt[..., 1]))
                mds = -float(np.mean(scores))
                self.logger.log({"mean_dose_score": mds}, epoch + 1)
                self.ckpt.save(epoch, {"state": self.state, "epoch": epoch},
                               {"mean_dose_score": mds})
            if self.plateau is not None:
                # monitor: the EMA train loss, per epoch (reference
                # monitor="moving_train_loss", train_light_c3d.py:239-241)
                new_lr = self.plateau.step(float(self.state.moving_loss))
                if new_lr != S.get_learning_rate(self.state.opt_state):
                    self.state = self.state.replace(
                        opt_state=S.set_learning_rate(self.state.opt_state, new_lr))
                    self.logger.log({"lr": new_lr}, epoch + 1)
            _save_epoch_slots(self.ckpt, cfg, epoch, global_step,
                              {"state": self.state, "epoch": epoch})
            if _stop_requested(cfg, global_step):
                break

    def test(self, test_ds: OpenKBPDataset, *, with_ivs: bool = True,
             plots_dir: Optional[str] = None) -> Dict[str, Any]:
        """OpenKBP test sweep (train_light_c3d.py:245-322)."""
        def predict_fn(batch):
            pred = self._predict(self.state.params, batch["input"])
            gt = batch["gt"]
            return M.postprocess_prediction_jax(pred, gt[..., 1:2])

        return evaluate_dose_model(predict_fn, test_ds, with_ivs=with_ivs,
                                   plots_dir=plots_dir)


class HDUNetTrainer:
    """HD-UNet baseline (train_light_hdunet.py) on the full reference harness:
    masked-L1 training, full-volume validation scored as the ×70 masked MAE →
    mean_dose_score (:127-163), best checkpoints on mean_dose_score=max plus
    an every-epoch 'last' slot with resume (:269-271,296), and the OpenKBP
    test sweep (:165-186)."""

    def __init__(self, cfg: TrainConfig, *, model: Optional[HDUNet] = None,
                 example_shape: Sequence[int] = (1, 128, 128, 128, 9)):
        from dose_prediction_tpu.train import losses as L

        self.cfg = cfg
        self.model = model if model is not None else HDUNet(growth_rate=16, upsample_chan=64)
        variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(cfg.seed), jnp.zeros(example_shape, jnp.float32))
        self.tx = S.make_optimizer(learning_rate=cfg.learning_rate,
                                   weight_decay=cfg.weight_decay)
        self.state, self.mesh, self.batch_sharding, self.val_sharding = \
            _init_state_with_mesh(variables, self.tx, cfg.mesh_shape, tp_rules=())
        self.train_step = STEP.make_simple_dose_train_step(
            self.model, self.tx, packed=cfg.feed_dtype == "packed")
        self.logger = MetricLogger(cfg.log_dir, run_name="hdunet")
        self.ckpt = C.CheckpointManager(cfg.ckpt_dir, monitor="mean_dose_score", mode="max")

        @jax.jit
        def eval_step(params, batch):
            pred = self.model.apply({"params": params}, batch["input"])
            gt = batch["gt"]
            vloss = L.masked_l1(pred, gt[..., 0:1], gt[..., 1:2])
            post = M.postprocess_prediction_jax(pred, gt[..., 1:2])
            score = M.dose_score_jax(post, 70.0 * gt[..., 0:1], gt[..., 1:2])
            return vloss, score, post

        self.eval_step = eval_step

        @jax.jit
        def eval_step_batched(params, batch):
            # dp-mesh validation: per-sample metrics, validity-weighted to
            # replicated scalars (pad rows carry weight 0)
            pred = self.model.apply({"params": params}, batch["input"])
            gt = batch["gt"]
            v = batch["valid"].astype(jnp.float32)
            mask = gt[..., 1:2]
            per_l = L.masked_l1_per_sample(pred, gt[..., 0:1], mask)
            post = M.postprocess_prediction_jax(pred, mask)
            per_s = L.masked_l1_per_sample(post, 70.0 * gt[..., 0:1], mask)
            n = jnp.maximum(jnp.sum(v), 1.0)
            return (jnp.sum(per_s * v) / n, jnp.sum(per_l * v) / n,
                    jnp.sum(v))

        self.eval_step_batched = eval_step_batched

    def validate(self, val_ds: OpenKBPDataset) -> Dict[str, float]:
        if self.mesh is not None and self.mesh.shape["data"] > 1:
            return _mesh_val_metrics(
                lambda b: self.eval_step_batched(self.state.params, b),
                val_ds, self.mesh, self.batch_sharding)
        scores, vlosses = [], []
        for batch in device_prefetch(dose_batches(
                val_ds, batch_size=1, shuffle=False, augment=False),
                sharding=self.val_sharding):
            vl, sc, _ = self.eval_step(self.state.params, batch)
            vlosses.append(float(vl))
            scores.append(float(sc))
        return {"mean_dose_score": -float(np.mean(scores)),
                "val_loss": float(np.mean(vlosses))}

    @_drains_checkpoints
    def fit(self, train_ds: OpenKBPDataset, val_ds: Optional[OpenKBPDataset] = None,
            *, resume: bool = True):
        cfg = self.cfg
        _check_mesh_batch(cfg, self.mesh)
        start_epoch = 0
        if resume:
            restored, start_epoch = _try_resume(
                self.ckpt, {"state": self.state, "epoch": 0},
                run_config=_resume_guard_config(self.cfg, self.model))
            if restored is not None:
                self.state = restored["state"]
        global_step = int(self.state.step)
        for epoch in range(start_epoch, cfg.max_epochs):
            losses = []
            for batch in _traced_epoch(device_prefetch(
                    _train_batches(cfg, train_ds, epoch,
                                   drop_last=self.batch_sharding is not None,
                                   process_rows=_feed_rows(self.batch_sharding)),
                    sharding=self.batch_sharding,
                    local_rows=_feed_rows(self.batch_sharding) is not None),
                    cfg.profile_dir if epoch == start_epoch else None):
                self.state, loss = self.train_step(self.state, batch)
                losses.append(loss)
                global_step += 1
                if _stop_requested(cfg, global_step):
                    break
            self.logger.log({"train_mean_loss": _host_mean(losses)}, epoch + 1)
            if val_ds is not None and (epoch + 1) % cfg.check_val == 0:
                metrics = self.validate(val_ds)
                self.logger.log(metrics, epoch + 1)
                self.ckpt.save(epoch, {"state": self.state, "epoch": epoch},
                               {"mean_dose_score": metrics["mean_dose_score"]})
            _save_epoch_slots(self.ckpt, cfg, epoch, global_step,
                              {"state": self.state, "epoch": epoch})
            if _stop_requested(cfg, global_step):
                return

    def test(self, test_ds: OpenKBPDataset, *, with_ivs: bool = True,
             plots_dir: Optional[str] = None) -> Dict[str, Any]:
        """OpenKBP test sweep (train_light_hdunet.py:165-186)."""
        return evaluate_dose_model(
            lambda batch: self.eval_step(self.state.params, batch)[2],
            test_ds, with_ivs=with_ivs, plots_dir=plots_dir)


class TranSegTrainer:
    """OAR-TranSeg trainer (train_light_transeg.py)."""

    def __init__(self, cfg: TrainConfig, *, model: Optional[TranSeg] = None,
                 crop: Sequence[int] = (96, 96, 96), num_classes: int = 8,
                 pretrained_params: Optional[Any] = None):
        self.cfg = cfg
        self.crop = tuple(crop)
        self.num_classes = num_classes
        self.model = model if model is not None else TranSeg(
            out_ch=num_classes, remat_blocks=cfg.remat_blocks)
        from dose_prediction_tpu.infer import aot as AOT

        key = jax.random.PRNGKey(cfg.seed)
        example_zeros = lambda: jnp.zeros((1, *self.crop, 1), jnp.float32)
        self.tx = S.make_optimizer(learning_rate=cfg.learning_rate,
                                   weight_decay=cfg.weight_decay)
        if cfg.mesh_shape:
            variables = jax.jit(self.model.init)(key, example_zeros())
            if pretrained_params is not None:
                # ckpt surgery: shape-matched partial restore (:126-146)
                params, _ = C.merge_partial(variables["params"], pretrained_params)
                variables = {**variables, "params": params}
            self.state, self.mesh, self.batch_sharding, self.val_sharding = \
                _init_state_with_mesh(variables, self.tx, cfg.mesh_shape)
        else:
            init_fn = lambda k: S.create_train_state(
                self.model.init(k, example_zeros()), self.tx)
            self.state = AOT.maybe_init_train_state(
                "transeg", cfg, self.model, (1, *self.crop, 1), init_fn, key)
            if pretrained_params is not None:
                # surgery after init is exact: fresh adamw moments are zeros,
                # independent of params
                params, _ = C.merge_partial(self.state.params, pretrained_params)
                self.state = self.state.replace(params=params)
            self.mesh = self.batch_sharding = self.val_sharding = None
        self.train_step = STEP.make_transeg_train_step(self.model, self.tx)
        self.train_step = AOT.maybe_wrap_train_step(
            "transeg", cfg, self.model, (1, *self.crop, 1), self.train_step)
        self.logger = MetricLogger(cfg.log_dir, run_name="transeg")
        self.ckpt = C.CheckpointManager(cfg.ckpt_dir, monitor="val_loss", mode="min")
        # validation programs built ONCE per sw_batch_size: a fresh jit closure
        # per validate() call retraces the whole 96³ sliding-window graph every
        # check_val epochs (seconds per epoch warm, minutes cold)
        self._sw_runs: Dict[int, Any] = {}
        from dose_prediction_tpu.train import losses as L

        self._val_loss_fn = jax.jit(
            lambda logits, labels: L.dice_ce_loss(logits, labels))

    def _predictor(self):
        # variables flow as jit arguments (see sliding_window module docstring)
        def predict(windows, variables):
            logits, _ = self.model.apply(variables, windows, train=False,
                                         mutable=["batch_stats"])
            return logits

        return predict

    def _sw_run(self, sw_batch_size: int):
        # on a dp mesh the sharded engine ignores sw_batch_size (ALL windows
        # form one sharded batch), so every size shares ONE cached program
        sharded = self.mesh is not None and self.mesh.shape["data"] > 1
        key = "sharded" if sharded else sw_batch_size
        run = self._sw_runs.get(key)
        if run is None:
            if sharded:
                # dp mesh: shard the WINDOW batch over the data axis — every
                # replica sweeps a different slice of the window grid instead
                # of idling behind one device's sw_batch loop (SURVEY §5.7
                # spatial tiling as the sequence-parallel analogue)
                from dose_prediction_tpu.infer.sliding_window import (
                    make_sliding_window_sharded_fn,
                )

                run = make_sliding_window_sharded_fn(
                    self._predictor(), self.mesh, roi_size=self.crop,
                    out_channels=self.num_classes)
            else:
                run = make_sliding_window_fn(
                    self._predictor(), roi_size=self.crop,
                    sw_batch_size=sw_batch_size, out_channels=self.num_classes)
            self._sw_runs[key] = run
        return run

    def validate(self, val_ds: OpenKBPDataset, *, sw_batch_size: int = 4):
        """Sliding-window full-volume val with Dice + HD95 + the DiceCE VAL
        loss the reference's checkpoint monitor watches
        (train_light_transeg.py:205-242: val_loss is computed on the
        sliding-window outputs, not on the training crops)."""
        from dose_prediction_tpu.infer.pipeline import pipeline_map

        run = self._sw_run(sw_batch_size)
        val_loss_fn = self._val_loss_fn
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        dices, hds, vlosses = [], [], []
        # multi-host: every process runs the sweep in lockstep on the global
        # mesh. Inputs must stay UNCOMMITTED (plain numpy) — jnp.asarray pins
        # them to one local device, which a global-mesh program rejects;
        # numpy args are treated as replicated (every rank passes the same
        # volume, which they do)
        multiproc = jax.process_count() > 1

        def produce(p):
            # device work dispatched async; only labels (int) and the loss
            # scalar ever cross to the host
            gt_labels = np.asarray(p.oars_label_encoded)
            vol = np.ascontiguousarray(p.ct[None, ..., None], np.float32)
            labels_in = gt_labels[None].astype(np.int32)
            logits = run(vol if multiproc else jnp.asarray(vol), variables)
            vloss = val_loss_fn(
                logits, labels_in if multiproc else jnp.asarray(labels_in))
            return p, gt_labels, jnp.argmax(logits, axis=-1), vloss

        def consume(staged):
            # host metrics for patient i overlap patient i+1's sweep
            p, gt_labels, labels_dev, vloss = staged
            vlosses.append(float(vloss))
            d, h = M.seg_metrics_per_class(np.asarray(labels_dev)[0], gt_labels,
                                           self.num_classes, p.spacing)
            dices.append(np.nanmean(d))
            hds.append(np.nanmean(h))

        for _ in pipeline_map(produce, consume, val_ds.patients):
            pass
        return (float(np.nanmean(dices)), float(np.nanmean(hds)),
                float(np.mean(vlosses)))

    @_drains_checkpoints
    def fit(self, train_ds: OpenKBPDataset, val_ds: Optional[OpenKBPDataset] = None,
            *, num_samples: int = 4, resume: bool = True):
        """Resume defaults to the 'last' slot like every other trainer
        (train_light_transeg.py:343-345 fit(ckpt_path='last.ckpt')), degrading
        past a corrupt slot to the newest monitored checkpoint."""
        cfg = self.cfg
        _check_mesh_batch(cfg, self.mesh)
        start_epoch = 0
        if resume:
            restored, start_epoch = _try_resume(
                self.ckpt, {"state": self.state, "epoch": 0},
                run_config=_resume_guard_config(self.cfg, self.model))
            if restored is not None:
                self.state = restored["state"]
                self.logger.log_text(f"resumed from epoch {start_epoch - 1}")
        global_step = int(self.state.step)
        for epoch in range(start_epoch, cfg.max_epochs):
            losses = []
            for batch in _traced_epoch(device_prefetch(seg_batches(
                    train_ds, crop=self.crop, num_samples=num_samples,
                    batch_size=cfg.batch_size, seed=cfg.seed + epoch,
                    drop_last=self.batch_sharding is not None,
                    num_samples_per_epoch=cfg.samples_per_epoch,
                    process_rows=_feed_rows(self.batch_sharding),
                    # seg has no bit-packed format; 'packed' maps to the bf16 CT
                    feed_dtype="bfloat16" if cfg.feed_dtype in ("bfloat16", "packed")
                    else "float32"),
                    sharding=self.batch_sharding,
                    local_rows=_feed_rows(self.batch_sharding) is not None),
                    cfg.profile_dir if epoch == start_epoch else None):
                self.state, loss = self.train_step(self.state, batch)
                losses.append(loss)
                global_step += 1
                if _stop_requested(cfg, global_step):
                    break
            self.logger.log({"train_loss": _host_mean(losses)}, epoch + 1)
            if val_ds is not None and (epoch + 1) % cfg.check_val == 0:
                dice, hd95, val_loss = self.validate(val_ds)
                self.logger.log({"dice_metric": dice, "hd95_metric": hd95,
                                 "val_loss": val_loss}, epoch + 1)
                # best-ckpt selection on the TRUE validation loss (:307-314)
                self.ckpt.save(epoch, {"state": self.state, "epoch": epoch},
                               {"val_loss": val_loss})
            _save_epoch_slots(self.ckpt, cfg, epoch, global_step,
                              {"state": self.state, "epoch": epoch})
            if _stop_requested(cfg, global_step):
                break


class UNETRSegTrainer(TranSegTrainer):
    """Seg mode_model=0: plain MONAI UNETR on the same DiceCE / sliding-window
    harness (train_light_transeg.py:93-107)."""

    def __init__(self, cfg: TrainConfig, *, model=None,
                 crop: Sequence[int] = (96, 96, 96), num_classes: int = 8,
                 pretrained_params: Optional[Any] = None):
        from dose_prediction_tpu.models.unetr import UNETR

        model = model if model is not None else UNETR(out_ch=num_classes)
        super().__init__(cfg, model=model, crop=crop, num_classes=num_classes,
                         pretrained_params=pretrained_params)


class ExpModelTrainer:
    """Pluggable experimental-model harness (train_light_exp_models.py
    TestModel): any model returning deep-supervision output lists trains with
    non-cascade GenLoss (:193, huber optional); val/test run sliding-window
    inference with an ×80 dose scale and roi = the full image size
    (:222-236,271-280). Best checkpoints on mean_dose_score=max + 'last'
    slot + resume (:372-374,412)."""

    def __init__(self, cfg: TrainConfig, model, *,
                 example_shape: Sequence[int] = (1, 128, 128, 128, 9),
                 huber: bool = False, val_scale: float = 80.0,
                 roi_size: Optional[Sequence[int]] = None):
        from dose_prediction_tpu.train import losses as L

        self.cfg = cfg
        self.model = model
        self.val_scale = val_scale
        # reference roi = (IMAGE_SIZE,)*3, i.e. the full training resolution
        # (train_light_exp_models.py:222); default to the example shape
        self.roi_size = tuple(roi_size) if roi_size is not None else tuple(example_shape[1:4])
        variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(cfg.seed), jnp.zeros(example_shape, jnp.float32))
        self.tx = S.make_optimizer(learning_rate=cfg.learning_rate,
                                   weight_decay=cfg.weight_decay)
        self.state, self.mesh, self.batch_sharding, self.val_sharding = \
            _init_state_with_mesh(variables, self.tx, cfg.mesh_shape)
        self.logger = MetricLogger(cfg.log_dir, run_name="exp_model")
        self.ckpt = C.CheckpointManager(cfg.ckpt_dir, monitor="mean_dose_score", mode="max")
        self.train_step = STEP.make_deep_supervision_train_step(
            self.model, self.tx, delta1=cfg.delta1, delta2=cfg.delta2,
            huber=huber, packed=cfg.feed_dtype == "packed")
        # one sliding-window program per sw_batch_size, built once (a fresh
        # closure per validate() call would retrace the whole sweep)
        self._sw_runs: Dict[int, Any] = {}
        self._val_loss_fn = jax.jit(
            lambda pred, gt: L.gen_loss(pred, gt, mode="val"))

    def _sw_run(self, sw_batch_size: int):
        run = self._sw_runs.get(sw_batch_size)
        if run is None:
            def predict(windows, variables):
                outs, _ = self.model.apply(variables, windows, train=False,
                                           mutable=["batch_stats"])
                return outs[0]

            run = make_sliding_window_fn(predict, roi_size=self.roi_size,
                                         sw_batch_size=sw_batch_size, out_channels=1)
            self._sw_runs[sw_batch_size] = run
        return run

    @_drains_checkpoints
    def fit(self, train_ds: OpenKBPDataset, val_ds: Optional[OpenKBPDataset] = None,
            *, resume: bool = True):
        cfg = self.cfg
        _check_mesh_batch(cfg, self.mesh)
        start_epoch = 0
        if resume:
            restored, start_epoch = _try_resume(
                self.ckpt, {"state": self.state, "epoch": 0},
                run_config=_resume_guard_config(self.cfg, self.model))
            if restored is not None:
                self.state = restored["state"]
        global_step = int(self.state.step)
        for epoch in range(start_epoch, cfg.max_epochs):
            losses = []
            for batch in _traced_epoch(device_prefetch(
                    _train_batches(cfg, train_ds, epoch,
                                   drop_last=self.batch_sharding is not None,
                                   process_rows=_feed_rows(self.batch_sharding)),
                    sharding=self.batch_sharding,
                    local_rows=_feed_rows(self.batch_sharding) is not None),
                    cfg.profile_dir if epoch == start_epoch else None):
                self.state, loss = self.train_step(self.state, batch)
                losses.append(loss)
                global_step += 1
                if _stop_requested(cfg, global_step):
                    break
            self.logger.log({"train_mean_loss": _host_mean(losses)}, epoch + 1)
            if val_ds is not None and (epoch + 1) % cfg.check_val == 0:
                metrics = self.validate(val_ds)
                self.logger.log(metrics, epoch + 1)
                self.ckpt.save(epoch, {"state": self.state, "epoch": epoch},
                               {"mean_dose_score": metrics["mean_dose_score"]})
            _save_epoch_slots(self.ckpt, cfg, epoch, global_step,
                              {"state": self.state, "epoch": epoch})
            if _stop_requested(cfg, global_step):
                return

    def validate(self, val_ds: OpenKBPDataset, *, sw_batch_size: int = 4) -> Dict[str, float]:
        """Sliding-window val (train_light_exp_models.py:218-247): GenLoss val
        loss on the blended output + masked MAE × val_scale → mean_dose_score."""
        return _sliding_val_sweep(
            self._sw_run(sw_batch_size),
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            val_ds, self._val_loss_fn, self.val_scale)

    def test(self, test_ds: OpenKBPDataset, *, sw_batch_size: int = 4,
             with_ivs: bool = True,
             plots_dir: Optional[str] = None) -> Dict[str, Any]:
        """OpenKBP test sweep on sliding-window predictions × val_scale
        (train_light_exp_models.py:263-300)."""
        run = self._sw_run(sw_batch_size)
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}

        def predict_fn(batch):
            pred = run(batch["input"], variables)
            return M.postprocess_prediction_jax(pred, batch["gt"][..., 1:2],
                                                scale=self.val_scale)

        return evaluate_dose_model(predict_fn, test_ds, with_ivs=with_ivs,
                                   plots_dir=plots_dir)


class DoseGANTrainer:
    """DoseGAN (train_light_dosegan.py): alternating G/D updates on the full
    reference harness — full-volume generator validation scored as the plain
    L1 val loss + ×70 masked MAE → mean_dose_score (:157-198), best ckpts on
    mean_dose_score=max with an every-epoch 'last' slot and resume
    (:313-315,349-355), and the OpenKBP test sweep (:207-225)."""

    def __init__(self, cfg: TrainConfig, *, ngf: int = 64, ndf: int = 64,
                 example_shape: Sequence[int] = (1, 128, 128, 128, 9),
                 l1_weight: float = 10.0, gan_lr: float = 2e-4):
        # defaults: delta3=10 L1 weight, lr=0.0002, Adam betas (0.5, 0.999)
        # (train_light_dosegan.py:199-205,298)
        self.cfg = cfg
        self.gen = UnetGenerator3D(out_ch=1, ngf=ngf)
        self.disc = NLayerDiscriminator(ndf=ndf)
        gx = jnp.zeros(example_shape, jnp.float32)
        # the critic consumes only the 1ch dose volume — the reference
        # NLayerDiscriminator is built with input_nc=1 and fed bare real/fake
        # doses (train_light_dosegan.py:74,131-136), not input||dose
        dx = jnp.zeros((*example_shape[:-1], 1), jnp.float32)
        g_vars = jax.jit(self.gen.init)(jax.random.PRNGKey(cfg.seed), gx)
        d_vars = jax.jit(self.disc.init)(jax.random.PRNGKey(cfg.seed + 1), dx)
        self.g_tx = S.make_optimizer(learning_rate=gan_lr, b1=0.5)
        self.d_tx = S.make_optimizer(learning_rate=gan_lr, b1=0.5)
        # both nets are pure conv stacks → dp-only sharding (params replicated)
        (self.g_state, self.d_state, self.mesh, self.batch_sharding,
         self.val_sharding) = _init_gan_states_with_mesh(
            g_vars, d_vars, self.g_tx, self.d_tx, cfg.mesh_shape,
            g_tp_rules=(), d_tp_rules=())
        self.step = STEP.make_dosegan_train_steps(
            self.gen, self.disc, self.g_tx, self.d_tx, l1_weight=l1_weight,
            packed=cfg.feed_dtype == "packed")
        self.logger = MetricLogger(cfg.log_dir, run_name="dosegan")
        self.ckpt = C.CheckpointManager(cfg.ckpt_dir, monitor="mean_dose_score", mode="max")

        @jax.jit
        def eval_step(g_params, g_stats, batch):
            pred, _ = self.gen.apply(
                {"params": g_params, "batch_stats": g_stats}, batch["input"],
                train=False, mutable=["batch_stats"])
            gt = batch["gt"]
            # val loss = unmasked L1 vs gt dose (criterionL1, :81,168)
            vloss = jnp.mean(jnp.abs(pred - gt[..., 0:1]))
            post = M.postprocess_prediction_jax(pred, gt[..., 1:2])
            score = M.dose_score_jax(post, 70.0 * gt[..., 0:1], gt[..., 1:2])
            return vloss, score, post

        self.eval_step = eval_step

        @jax.jit
        def eval_step_batched(g_params, g_stats, batch):
            # dp-mesh validation: per-sample metrics, validity-weighted to
            # replicated scalars (pad rows carry weight 0)
            pred, _ = self.gen.apply(
                {"params": g_params, "batch_stats": g_stats}, batch["input"],
                train=False, mutable=["batch_stats"])
            gt = batch["gt"]
            v = batch["valid"].astype(jnp.float32)
            axes = tuple(range(1, pred.ndim))
            per_l = jnp.mean(jnp.abs(pred.astype(jnp.float32)
                                     - gt[..., 0:1].astype(jnp.float32)),
                             axis=axes)
            mask = gt[..., 1:2]
            post = M.postprocess_prediction_jax(pred, mask)
            from dose_prediction_tpu.train import losses as L

            per_s = L.masked_l1_per_sample(post, 70.0 * gt[..., 0:1], mask)
            n = jnp.maximum(jnp.sum(v), 1.0)
            return (jnp.sum(per_s * v) / n, jnp.sum(per_l * v) / n,
                    jnp.sum(v))

        self.eval_step_batched = eval_step_batched

    def validate(self, val_ds: OpenKBPDataset) -> Dict[str, float]:
        if self.mesh is not None and self.mesh.shape["data"] > 1:
            return _mesh_val_metrics(
                lambda b: self.eval_step_batched(
                    self.g_state.params, self.g_state.batch_stats, b),
                val_ds, self.mesh, self.batch_sharding)
        scores, vlosses = [], []
        for batch in device_prefetch(dose_batches(
                val_ds, batch_size=1, shuffle=False, augment=False),
                sharding=self.val_sharding):
            vl, sc, _ = self.eval_step(self.g_state.params, self.g_state.batch_stats, batch)
            vlosses.append(float(vl))
            scores.append(float(sc))
        return {"mean_dose_score": -float(np.mean(scores)),
                "val_loss": float(np.mean(vlosses))}

    @_drains_checkpoints
    def fit(self, train_ds: OpenKBPDataset, val_ds: Optional[OpenKBPDataset] = None,
            *, resume: bool = True):
        cfg = self.cfg
        _check_mesh_batch(cfg, self.mesh)
        start_epoch = 0
        if resume:
            restored, start_epoch = _try_resume(
                self.ckpt, {"g": self.g_state, "d": self.d_state, "epoch": 0},
                run_config=_resume_guard_config(self.cfg, self.gen, self.disc))
            if restored is not None:
                self.g_state, self.d_state = restored["g"], restored["d"]
        global_step = int(self.g_state.step)
        for epoch in range(start_epoch, cfg.max_epochs):
            g_losses, d_losses = [], []
            for batch in _traced_epoch(device_prefetch(
                    _train_batches(cfg, train_ds, epoch,
                                   drop_last=self.batch_sharding is not None,
                                   process_rows=_feed_rows(self.batch_sharding)),
                    sharding=self.batch_sharding,
                    local_rows=_feed_rows(self.batch_sharding) is not None),
                    cfg.profile_dir if epoch == start_epoch else None):
                self.g_state, self.d_state, info = self.step(self.g_state, self.d_state, batch)
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

    def test(self, test_ds: OpenKBPDataset, *, with_ivs: bool = True,
             plots_dir: Optional[str] = None) -> Dict[str, Any]:
        """OpenKBP test sweep (train_light_dosegan.py:207-225)."""
        return evaluate_dose_model(
            lambda batch: self.eval_step(self.g_state.params,
                                         self.g_state.batch_stats, batch)[2],
            test_ds, with_ivs=with_ivs, plots_dir=plots_dir)

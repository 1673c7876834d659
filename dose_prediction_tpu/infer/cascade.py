"""End-to-end linked cascade: CT → sliding-window OAR segmentation → one-hot
masks → concat(PTV, OARs, CT) → DOSE-PYFER dose map.

Parity target: LinkedNet.test_step (train_light_linked_model.py:138-176),
which round-trips through the CPU between every stage (.cpu() at :150,169).
Here every intermediate stays in HBM.

Model variables flow through the jitted stages as ARGUMENTS (not closure
captures): remote-compile services cap HLO upload size, and capturing ~350 MB
of weights as constants blows that cap (observed HTTP 413 on the axon
tunnel). As arguments they live on device and never enter the program blob.

Two execution modes:
- ``fuse=False`` (default): seg sweep and dose forward are separate jit
  programs; device arrays flow between them without host transfers, runtime
  is the same, but XLA compiles two medium graphs instead of one giant one.
- ``fuse=True``: single jit program (fastest dispatch once the compilation
  cache is warm).

Note on axis permutes: the reference applies (0,3,2,1)/(0,1,4,3,2) permutes
between stages (:157-165) to undo inconsistent transposes between its two
dataloaders; this framework's loader uses one consistent RAS layout for both
tasks, so no permutes are needed (deviation documented, not a behavior gap).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from dose_prediction_tpu.evaluation.metrics import postprocess_prediction_jax
from dose_prediction_tpu.infer.sliding_window import sliding_window_inference


def make_cascade_stages(
    seg_model,
    dose_model,
    *,
    num_oar_classes: int = 8,
    roi_size: Sequence[int] = (96, 96, 96),
    sw_batch_size: int = 4,
    overlap: float = 0.25,
    dose_scale: float = 70.0,
    seg_mode: str = "sliding",
):
    """The two cascade stages as pure functions (un-jitted):
    ``stage1(seg_vars, ct, ptv) -> structures`` (seg + one-hot + 9-ch concat)
    and ``stage2(dose_vars, structures, dose_mask) -> dose_gy``. Exposed
    separately so the streaming pipeline (infer/pipeline.py) can place them
    on different devices.

    ``seg_mode``: 'sliding' = the reference's MONAI sliding-window sweep
    (:152-154) — behavioral parity. 'dense' = ONE full-volume seg forward;
    the overlapping-window sweep recomputes ~2.4× of the conv work at the
    128³/96³ geometry, so dense is substantially faster. Requires the seg
    model to accept the full volume (construct TranSeg with
    trained_grid=(roi/patch)³ so the ViT pos-embedding resizes). Accuracy
    equals the sliding path only when roi ≥ volume; on real data validate the
    dense path's Dice before serving with it."""

    def seg_predictor(windows, seg_vars):
        logits, _ = seg_model.apply(seg_vars, windows, train=False,
                                    mutable=["batch_stats"])
        return logits

    if seg_mode not in ("sliding", "dense"):
        raise ValueError(f"unknown seg_mode {seg_mode!r} (want 'sliding' or 'dense')")

    def stage1(seg_vars, ct: jax.Array, ptv: jax.Array) -> jax.Array:
        if seg_mode == "dense":
            logits = seg_predictor(ct, seg_vars)
        else:
            # sliding-window segmentation over the full CT (:152-154)
            logits = sliding_window_inference(
                ct, seg_predictor, roi_size=roi_size, sw_batch_size=sw_batch_size,
                overlap=overlap, out_channels=num_oar_classes,
                predictor_args=(seg_vars,))
        labels = jnp.argmax(logits, axis=-1)
        # one-hot, drop background channel (:157-160)
        oars = jax.nn.one_hot(labels, num_oar_classes, dtype=ct.dtype)[..., 1:]
        # 9-channel dose input = (PTV, 7 OARs, CT) (:167)
        return jnp.concatenate([ptv, oars, ct], axis=-1)

    def stage2(dose_vars, structures: jax.Array, dose_mask: jax.Array) -> jax.Array:
        (pred_a, preds_b), _ = dose_model.apply(
            dose_vars, structures, train=False, mutable=["batch_stats"])
        # mask out-of-region and negative voxels, scale to Gy (:171-173)
        return postprocess_prediction_jax(preds_b[0], dose_mask, scale=dose_scale)

    return stage1, stage2


def make_cascade_fn(
    seg_model,
    seg_variables,
    dose_model,
    dose_variables,
    *,
    num_oar_classes: int = 8,
    roi_size: Sequence[int] = (96, 96, 96),
    sw_batch_size: int = 4,
    overlap: float = 0.25,
    dose_scale: float = 70.0,
    fuse: bool = False,
    seg_mode: str = "sliding",
    aot: bool = False,
    input_dtype=None,
) -> Callable[[jax.Array, jax.Array, jax.Array], jax.Array]:
    """Build the linked inference program.

    Returns ``run(ct, ptv, dose_mask) -> dose_gy`` where
        ct, ptv, dose_mask: ``(1, D, H, W, 1)``;
        dose_gy: ``(1, D, H, W, 1)`` in Gy, masked and clamped like the
        reference post-process (:171-173).

    ``aot=True`` tries the shipped pre-compiled serve executables
    (infer.aot, artifacts/serve_aot/) before jit — cold-start seconds
    instead of minutes when the configuration matches what was shipped
    (full-size bf16 models, 128³ volumes, the default sweep geometry); any
    mismatch falls back to jit on the first call. ``input_dtype`` casts
    ct/ptv/dose_mask before dispatch (the shipped programs take bfloat16
    volumes; checkpoint params stay float32 either way).
    """
    stage1, stage2 = make_cascade_stages(
        seg_model, dose_model, num_oar_classes=num_oar_classes,
        roi_size=roi_size, sw_batch_size=sw_batch_size, overlap=overlap,
        dose_scale=dose_scale, seg_mode=seg_mode)

    def cast(x):
        return x.astype(input_dtype) if input_dtype is not None else x

    if fuse:
        fused = jax.jit(lambda sv, dv, ct, ptv, mask: stage2(dv, stage1(sv, ct, ptv), mask))

        def run(ct, ptv, dose_mask):
            return fused(seg_variables, dose_variables, cast(ct), cast(ptv),
                         cast(dose_mask))

        return run

    stage1_fn: Callable = jax.jit(stage1)
    stage2_fn: Callable = jax.jit(stage2)
    if aot:
        from dose_prediction_tpu.infer.aot import SHIPPED, LazyAOTStage

        shipped_geometry = (
            num_oar_classes == SHIPPED["num_oar_classes"]
            and dose_scale == SHIPPED["dose_scale"]
        )
        stage1_shipped = shipped_geometry and (
            seg_mode == "dense"
            or (tuple(roi_size) == SHIPPED["roi_size"]
                and sw_batch_size == SHIPPED["sw_batch_size"]
                and overlap == SHIPPED["overlap"]))
        if stage1_shipped:
            name1 = "stage1_dense" if seg_mode == "dense" else "stage1"
            stage1_fn = LazyAOTStage(name1, stage1_fn)
        if shipped_geometry:
            stage2_fn = LazyAOTStage("stage2", stage2_fn)

    def run(ct: jax.Array, ptv: jax.Array, dose_mask: jax.Array) -> jax.Array:
        return stage2_fn(dose_variables, stage1_fn(seg_variables, cast(ct), cast(ptv)),
                         cast(dose_mask))

    return run

"""Linked-model evaluation — the end-to-end serve path as a harness.

Parity target: train_light_linked_model.py LinkedNet (:65-130) + test_step
(:138-228): compose a trained TranSeg with a trained DOSE-PYFER, run the full
cascade per patient, and accumulate dose score, DVH score, IVS curves, DVH
plots and slice triptychs.

Weight loading uses path-based surgery (core.checkpoint.merge_partial) rather
than the reference's fragile positional key-zip copy (:83-97) — the outcome
(both stage's weights installed) is identical, without depending on dict
ordering.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from dose_prediction_tpu.core import checkpoint as C
from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.evaluation import metrics as M
from dose_prediction_tpu.infer.cascade import make_cascade_fn
from dose_prediction_tpu.models import DosePyfer, TranSeg
from dose_prediction_tpu.utils.logging import MetricLogger


class LinkedModel:
    """TranSeg + DOSE-PYFER composed for full-cascade inference."""

    def __init__(
        self,
        *,
        seg_model: Optional[TranSeg] = None,
        dose_model: Optional[DosePyfer] = None,
        seg_variables: Optional[Any] = None,
        dose_variables: Optional[Any] = None,
        seg_ckpt: Optional[str] = None,
        dose_ckpt: Optional[str] = None,
        roi_size: Sequence[int] = (96, 96, 96),
        sw_batch_size: int = 4,
        seg_mode: str = "sliding",
        serve_dtype: str = "float32",
        seg_block_family: str = "seg",
        seg_k7_mode: str = "dense",
    ):
        """``seg_mode='dense'`` replaces the stage-1 sliding-window sweep with
        ONE full-volume seg forward (pos-embed grid adaptation; ~2.6× faster
        serve — infer/cascade.py): the default seg model is then built with
        ``trained_grid = roi/patch`` so a roi-trained checkpoint loads.

        ``serve_dtype='bfloat16'`` runs the cascade with bfloat16 activations
        (checkpoint params stay float32 — layers cast at use) and tries the
        shipped pre-compiled serve executables (infer.aot) before jit: the
        TPU serving configuration, cold-start in seconds. float32 keeps
        reference-numerics parity and always jit-compiles.

        ``seg_block_family`` selects the TranSeg conv-block flavor the seg
        checkpoint was trained with ('seg' | 'old' | 'ablation' — 'old' is
        what import-torch produces for reference mode_model=1 checkpoints,
        train_light_transeg.py:20)."""
        dtype = jnp.bfloat16 if serve_dtype == "bfloat16" else jnp.float32
        if seg_model is None:
            # seg_k7_mode must match the checkpoint's decoder flavor (a
            # separable-trained checkpoint has conv0_d/_h/_w param trees —
            # see train transeg --k7-mode)
            if seg_mode == "dense":
                grid = tuple(int(r) // TranSeg.patch_size for r in roi_size)
                seg_model = TranSeg(trained_grid=grid, dtype=dtype,
                                    block_family=seg_block_family,
                                    k7_mode=seg_k7_mode)
            else:
                seg_model = TranSeg(dtype=dtype, block_family=seg_block_family,
                                    k7_mode=seg_k7_mode)
        self.seg_model = seg_model
        self.dose_model = dose_model if dose_model is not None else DosePyfer(dtype=dtype)
        if seg_variables is None:
            if seg_ckpt is None:
                raise ValueError("need seg_variables or seg_ckpt")
            seg_variables = C.variables_from_checkpoint(C.restore_checkpoint(seg_ckpt))
        if dose_variables is None:
            if dose_ckpt is None:
                raise ValueError("need dose_variables or dose_ckpt")
            dose_variables = C.variables_from_checkpoint(C.restore_checkpoint(dose_ckpt))
        self.run = make_cascade_fn(
            self.seg_model, seg_variables, self.dose_model, dose_variables,
            roi_size=roi_size, sw_batch_size=sw_batch_size, seg_mode=seg_mode,
            aot=serve_dtype == "bfloat16",
            input_dtype=dtype if serve_dtype == "bfloat16" else None)

    def predict_patient(self, patient) -> np.ndarray:
        """Full cascade on one Patient record → dose map in Gy (D,H,W)."""
        out = self.run(
            jnp.asarray(patient.ct[None, ..., None]),
            jnp.asarray(patient.ptv[None, ..., None]),
            jnp.asarray(patient.dose_mask[None, ..., None]),
        )
        return np.asarray(out)[0, ..., 0]

    def evaluate(self, ds: OpenKBPDataset, *, log_dir: Optional[str] = None,
                 plots_dir: Optional[str] = None, with_ivs: bool = True) -> Dict:
        """The reference test loop (:138-228): per-patient dose/DVH/IVS, DVH
        plots and slice error maps when ``plots_dir`` is given. Software-
        pipelined: patient i+1's cascade is dispatched before patient i's
        prediction is read for host scoring."""
        from dose_prediction_tpu.infer.pipeline import pipeline_map

        dose_scores, dvh_scores, ivs_curves = [], [], []
        per_patient: Dict[str, Dict] = {}

        def produce(p):
            return p, self.run(
                jnp.asarray(p.ct[None, ..., None]),
                jnp.asarray(p.ptv[None, ..., None]),
                jnp.asarray(p.dose_mask[None, ..., None]))

        def consume(staged):
            p, out = staged
            pred = np.asarray(out)[0, ..., 0]
            score = M.dose_score(pred, p.real_dose, p.dose_mask)
            dvh = M.dvh_score_for_patient(pred, p.real_dose, p.structures, p.spacing)
            dose_scores.append(score)
            if np.isfinite(dvh["dvh_dif"]):
                dvh_scores.append(dvh["dvh_dif"])
            if with_ivs:
                ivs_curves.append(M.ivs_sweep(pred, p.real_dose))
            per_patient[p.patient_id] = {"dose_dif": score, "dvh_dif": dvh["dvh_dif"]}
            if plots_dir:
                from dose_prediction_tpu.evaluation.plots import plot_dvh, save_slice_triptychs
                plot_dvh(pred, p.real_dose, p.structures,
                         Path(plots_dir) / f"dvh_{p.patient_id}.png")
                save_slice_triptychs(pred, p.real_dose,
                                     Path(plots_dir) / p.patient_id, every=8)

        for _ in pipeline_map(produce, consume, ds.patients):
            pass
        results = {
            "mean_dose_score": float(np.mean(dose_scores)),
            "std_dose_score": float(np.std(dose_scores)),
            "mean_dvh_score": float(np.mean(dvh_scores)) if dvh_scores else float("nan"),
            "ivs": np.mean(np.stack(ivs_curves), axis=0).tolist() if ivs_curves else None,
            "per_patient": per_patient,
        }
        if log_dir:
            logger = MetricLogger(log_dir, run_name="linked")
            logger.log({"mean_dose_metric": results["mean_dose_score"],
                        "mean_dvh_metric": results["mean_dvh_score"]}, 0)
        return results

"""Dense serve fast-path accuracy gate (VERDICT r3 next-round #3).

``seg_mode='dense'`` replaces the stage-1 sliding-window sweep with ONE
full-volume TranSeg forward via pos-embed grid adaptation
(infer/cascade.py:54-61, nn/vit.py PatchEmbed3D.trained_grid). This test
trains a small TranSeg on ROI-sized crops, then runs BOTH serve modes on a
larger volume (the reference geometry ratio: ROI-trained → larger dense grid,
like 96³→128³) and gates the dense path on argmax-label agreement with the
reference-parity sliding sweep.

Why label agreement and not Dice-vs-GT: the synthetic fixture's OAR blobs
are placed independently of the CT content (data/synthetic.py), so the
segmentation task is unlearnable in principle and Dice-vs-GT stays ≈0 for
any model; agreement between the two serve modes with shared trained weights
is the meaningful mechanism-level gate (measured 1.0 on this fixture —
docs/PERFORMANCE.md round-4). Real-data Dice validation remains required
before making 'dense' a serving default; the CLI keeps 'sliding' as the
default and prints a warning when 'dense' is chosen (cli/main.py linked-eval).

Reference behavior anchor: sliding_window_inference in
train_light_transeg.py:209-211.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
from dose_prediction_tpu.evaluation import metrics as M
from dose_prediction_tpu.models import TranSeg
from dose_prediction_tpu.train.trainers import TrainConfig, TranSegTrainer

VOL, ROI = 96, 64
SMALL = dict(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
             num_layers=4, num_heads=2)


@pytest.mark.slow
def test_dense_matches_sliding_after_training(tmp_path):
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=1,
                                     shape=(VOL,) * 3)
    ds = OpenKBPDataset(pattern, keep_structures=True)
    cfg = TrainConfig(max_epochs=5, check_val=100, batch_size=2,
                      learning_rate=3e-3, ckpt_dir=str(tmp_path / "ckpt"),
                      log_dir=str(tmp_path / "logs"))
    tr = TranSegTrainer(cfg, model=TranSeg(**SMALL), crop=(ROI,) * 3)
    tr.fit(ds, None, num_samples=2, resume=False)
    assert np.isfinite(float(tr.state.moving_loss))

    variables = {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    p = ds.patients[0]
    ct = jnp.asarray(p.ct[None, ..., None])

    # reference-parity sliding sweep (8 windows at this geometry)
    logits_s = tr._sw_run(8)(ct, variables)
    lab_s = np.asarray(jnp.argmax(logits_s, axis=-1))[0]

    # dense: ONE full-volume forward, pos-embed resized from the ROI grid
    dense_model = TranSeg(**SMALL, trained_grid=(ROI // 16,) * 3)
    logits_d, _ = dense_model.apply(variables, ct, train=False,
                                    mutable=["batch_stats"])
    lab_d = np.asarray(jnp.argmax(logits_d, axis=-1))[0]

    agreement = float((lab_s == lab_d).mean())
    gt = np.asarray(p.oars_label_encoded)
    dice_s, _ = M.seg_metrics_per_class(lab_s, gt, 8, p.spacing)
    dice_d, _ = M.seg_metrics_per_class(lab_d, gt, 8, p.spacing)
    delta = np.nanmax(np.abs(np.nan_to_num(dice_s) - np.nan_to_num(dice_d)))
    print(f"[dense-gate] agreement={agreement:.4f} "
          f"dice_sliding={np.nanmean(dice_s):.4f} "
          f"dice_dense={np.nanmean(dice_d):.4f} max_class_delta={delta:.4f}")
    assert agreement >= 0.98, f"dense/sliding label agreement {agreement}"
    assert delta <= 0.05, f"per-class Dice delta {delta}"

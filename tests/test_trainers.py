"""End-to-end trainer smoke tests on the synthetic fixture: the full vertical
slice (NIfTI → preprocess → augment → prefetch → jit step → ckpt → eval)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
from dose_prediction_tpu.models import CascadeC3D, DosePyfer, TranSeg
from dose_prediction_tpu.train.trainers import (
    CascadeC3DTrainer,
    PyferTrainer,
    TrainConfig,
    TranSegTrainer,
    evaluate_dose_model,
)

SIZE = 32

SMALL_PYFER = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                        hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)
SMALL_C3D = CascadeC3D(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                       list_ch_B=(-1, 2, 4, 8, 16, 32))
SMALL_SEG = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                    num_layers=4, num_heads=2)


@pytest.fixture(scope="module")
def synthetic_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("openkbp")
    pattern = make_synthetic_dataset(root, n_patients=2, shape=(SIZE, SIZE, SIZE))
    return OpenKBPDataset(pattern, keep_structures=True)


def test_pyfer_trainer_end_to_end(tmp_path, synthetic_ds):
    cfg = TrainConfig(max_epochs=2, check_val=1, max_steps=4,
                      ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"))
    tr = PyferTrainer(cfg, model=SMALL_PYFER, example_shape=(1, SIZE, SIZE, SIZE, 9))
    tr.fit(synthetic_ds, synthetic_ds, resume=False)
    assert np.isfinite(float(tr.state.moving_loss))
    assert (tmp_path / "logs" / "metrics.jsonl").exists()
    # checkpoint was written and can resume
    step, restored = tr.ckpt.restore_latest({"state": tr.state, "epoch": 0})
    assert step is not None

    results = tr.test(synthetic_ds)
    assert np.isfinite(results["mean_dose_score"])
    assert np.isfinite(results["mean_dvh_score"])
    assert len(results["ivs"]) == 101
    assert len(results["per_patient"]) == 2


def test_pyfer_trainer_resume(tmp_path, synthetic_ds):
    cfg = TrainConfig(max_epochs=1, check_val=1, max_steps=2,
                      ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"))
    tr = PyferTrainer(cfg, model=SMALL_PYFER, example_shape=(1, SIZE, SIZE, SIZE, 9))
    tr.fit(synthetic_ds, synthetic_ds, resume=False)
    cfg2 = TrainConfig(max_epochs=2, check_val=1, max_steps=4,
                       ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"))
    tr2 = PyferTrainer(cfg2, model=SMALL_PYFER, example_shape=(1, SIZE, SIZE, SIZE, 9))
    tr2.fit(synthetic_ds, synthetic_ds, resume=True)  # restores epoch 0 ckpt
    assert int(tr2.state.step) >= 2


def test_c3d_trainer(tmp_path, synthetic_ds):
    cfg = TrainConfig(max_epochs=1, check_val=1, max_steps=2, learning_rate=1e-3,
                      ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"))
    tr = CascadeC3DTrainer(cfg, model=SMALL_C3D, example_shape=(1, SIZE, SIZE, SIZE, 9))
    tr.fit(synthetic_ds, synthetic_ds)
    assert np.isfinite(float(tr.state.moving_loss))


def test_transeg_trainer_with_sliding_val(tmp_path, synthetic_ds):
    cfg = TrainConfig(max_epochs=1, check_val=1, max_steps=2, batch_size=2,
                      ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"))
    tr = TranSegTrainer(cfg, model=SMALL_SEG, crop=(16, 16, 16))
    tr.fit(synthetic_ds, val_ds=None, num_samples=2)
    dice, hd95 = tr.validate(synthetic_ds, sw_batch_size=2)
    assert np.isnan(dice) or 0.0 <= dice <= 1.0


def test_evaluate_dose_model_perfect_prediction(synthetic_ds):
    """A perfect predictor must score 0 dose error and 0 DVH error."""
    def perfect(batch):
        gt = batch["gt"]
        return (70.0 * gt[..., 0:1] * (gt[..., 1:2] >= 1)).astype(jnp.float32)

    res = evaluate_dose_model(perfect, synthetic_ds, with_ivs=False)
    assert res["mean_dose_score"] == pytest.approx(0.0, abs=1e-4)
    assert res["mean_dvh_score"] == pytest.approx(0.0, abs=1e-3)

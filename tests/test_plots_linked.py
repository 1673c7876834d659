"""Smoke tests: DVH plots, slice triptychs, ExpModelTrainer, LinkedModel."""

import numpy as np
import pytest

import jax.numpy as jnp

from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
from dose_prediction_tpu.evaluation.plots import cumulative_dvh, plot_dvh, save_slice_triptychs

SIZE = 32


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("openkbp_plots")
    pattern = make_synthetic_dataset(root, n_patients=1, shape=(SIZE, SIZE, SIZE))
    return OpenKBPDataset(pattern, keep_structures=True)


def test_cumulative_dvh_monotone(rng):
    dose = np.abs(rng.standard_normal((16, 16, 16))).astype(np.float32) * 40
    roi = (rng.random((16, 16, 16)) > 0.6).astype(np.float32)
    curve = cumulative_dvh(dose, roi)
    assert curve[0] == pytest.approx(1.0, abs=1e-6)
    assert (np.diff(curve) <= 1e-9).all()  # non-increasing
    assert curve[-1] <= 0.01


def test_plot_dvh_writes_png(tmp_path, ds):
    p = ds[0]
    pred = p.real_dose + 1.0
    out = tmp_path / "dvh.png"
    plot_dvh(pred, p.real_dose, p.structures, out)
    assert out.exists() and out.stat().st_size > 1000


def test_slice_triptychs(tmp_path, rng):
    pred = np.abs(rng.standard_normal((8, 16, 16))).astype(np.float32)
    gt = pred + 0.1
    save_slice_triptychs(pred, gt, tmp_path / "slices", every=4)
    files = list((tmp_path / "slices").glob("*.jpg"))
    assert len(files) == 2  # slices 0 and 4


@pytest.mark.slow
def test_exp_model_trainer(tmp_path, ds):
    from dose_prediction_tpu.models.experiments import VitGenerator
    from dose_prediction_tpu.train.trainers import ExpModelTrainer, TrainConfig

    cfg = TrainConfig(max_epochs=1, max_steps=1, learning_rate=1e-3,
                      ckpt_dir=str(tmp_path), log_dir=str(tmp_path))
    gen = VitGenerator(out_ch=1, feature_size=2, hidden_size=24, mlp_dim=48,
                       num_layers=4, num_heads=2, mode_multi_dec=True)
    # ROI must equal the trained volume size: ViT pos-embeddings are
    # token-grid-specific (reference uses roi == IMAGE_SIZE here too)
    tr = ExpModelTrainer(cfg, gen, example_shape=(1, SIZE, SIZE, SIZE, 9),
                         roi_size=(SIZE, SIZE, SIZE))
    tr.fit(ds)
    metrics = tr.validate(ds, sw_batch_size=2)
    assert np.isfinite(metrics["mean_dose_score"])
    assert np.isfinite(metrics["val_loss"])


def test_linked_model_evaluate(tmp_path, ds):
    import jax

    from dose_prediction_tpu.models import DosePyfer, TranSeg
    from dose_prediction_tpu.train.linked import LinkedModel

    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=4, num_heads=2)
    dose = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                     hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)
    seg_vars = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    dose_vars = dose.init(jax.random.PRNGKey(1), jnp.zeros((1, SIZE, SIZE, SIZE, 9)))
    linked = LinkedModel(seg_model=seg, dose_model=dose,
                         seg_variables=seg_vars, dose_variables=dose_vars,
                         roi_size=(SIZE, SIZE, SIZE), sw_batch_size=1)
    results = linked.evaluate(ds, with_ivs=False)
    assert np.isfinite(results["mean_dose_score"])
    assert len(results["per_patient"]) == 1

"""Mesh-parallel validation: on a dp mesh the full-volume validation sweep
batches `data`-axis patients per program (padded tail + validity weights)
instead of idling N−1 replicas on batch-1 programs — and its cohort metrics
equal the reference-parity per-patient sweep exactly
(train/trainers.py::_mesh_val_metrics)."""

import numpy as np
import pytest

from dose_prediction_tpu.data.openkbp import OpenKBPDataset
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
from dose_prediction_tpu.models import HDUNet
from dose_prediction_tpu.train.trainers import (
    HDUNetTrainer,
    PyferTrainer,
    TrainConfig,
    _padded_dose_val_batches,
)

SIZE = 16


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    # 3 patients: odd cohort vs val_batch 2 exercises the padded tail
    root = str(tmp_path_factory.mktemp("meshval"))
    pattern = make_synthetic_dataset(root, n_patients=3,
                                     shape=(SIZE, SIZE, SIZE))
    return OpenKBPDataset(pattern)


def test_padded_val_batches_shapes_and_validity(ds):
    batches = list(_padded_dose_val_batches(ds, 2))
    assert [b["input"].shape[0] for b in batches] == [2, 2]
    np.testing.assert_array_equal(batches[0]["valid"], [1.0, 1.0])
    np.testing.assert_array_equal(batches[1]["valid"], [1.0, 0.0])
    # pad row repeats the last real patient (identical geometry, weight 0)
    np.testing.assert_array_equal(batches[1]["input"][1],
                                  batches[1]["input"][0])


def _small_hdunet():
    return HDUNet(growth_rate=2, upsample_chan=4)


def test_hdunet_mesh_validate_matches_batch1_sweep(tmp_path, ds):
    kw = dict(max_epochs=1, check_val=1, batch_size=2, learning_rate=1e-3)
    ref = HDUNetTrainer(
        TrainConfig(ckpt_dir=str(tmp_path / "c1"), log_dir=str(tmp_path / "l1"),
                    **kw),
        model=_small_hdunet(), example_shape=(1, SIZE, SIZE, SIZE, 9))
    meshed = HDUNetTrainer(
        TrainConfig(ckpt_dir=str(tmp_path / "c2"), log_dir=str(tmp_path / "l2"),
                    mesh_shape={"data": 2}, **kw),
        model=_small_hdunet(), example_shape=(1, SIZE, SIZE, SIZE, 9))
    assert meshed.mesh is not None
    m_ref = ref.validate(ds)       # per-patient batch-1 sweep
    m_mesh = meshed.validate(ds)   # batched dp sweep, padded tail
    assert m_mesh["mean_dose_score"] == pytest.approx(
        m_ref["mean_dose_score"], rel=1e-5)
    assert m_mesh["val_loss"] == pytest.approx(m_ref["val_loss"], rel=1e-5)


def test_transeg_mesh_validate_matches_local_sweep(tmp_path, tmp_path_factory):
    """On a dp mesh, TranSeg validation shards the sliding-window batch over
    the data axis (make_sliding_window_sharded_fn) — metrics must match the
    single-device sweep."""
    from dose_prediction_tpu.models import TranSeg
    from dose_prediction_tpu.train.trainers import TranSegTrainer

    root = str(tmp_path_factory.mktemp("meshseg"))
    pattern = make_synthetic_dataset(root, n_patients=2, shape=(24, 24, 24))
    seg_ds = OpenKBPDataset(pattern)

    def model():
        return TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                       num_layers=2, num_heads=2)

    kw = dict(max_epochs=1, check_val=1, batch_size=2, learning_rate=1e-3)
    ref = TranSegTrainer(
        TrainConfig(ckpt_dir=str(tmp_path / "c1"), log_dir=str(tmp_path / "l1"),
                    **kw),
        model=model(), crop=(16, 16, 16))
    meshed = TranSegTrainer(
        TrainConfig(ckpt_dir=str(tmp_path / "c2"), log_dir=str(tmp_path / "l2"),
                    mesh_shape={"data": 2}, **kw),
        model=model(), crop=(16, 16, 16))
    d_ref, h_ref, v_ref = ref.validate(seg_ds, sw_batch_size=2)
    d_mesh, h_mesh, v_mesh = meshed.validate(seg_ds, sw_batch_size=2)
    assert v_mesh == pytest.approx(v_ref, rel=1e-4)
    for a, b in ((d_mesh, d_ref), (h_mesh, h_ref)):
        if np.isnan(b):
            assert np.isnan(a)
        else:
            assert a == pytest.approx(b, rel=1e-4, abs=1e-6)


@pytest.mark.slow
def test_pyfer_fit_mesh_validation_round(tmp_path, ds):
    """PyferTrainer.fit on a dp=2 mesh runs the batched validation path and
    logs the same metrics a single-device fit computes."""
    from dose_prediction_tpu.models import DosePyfer

    def model():
        return DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                         feature_size=2, hidden_size=24, mlp_dim=48,
                         num_layers=2, num_heads=2)

    kw = dict(max_epochs=1, check_val=1, batch_size=2, learning_rate=1e-3,
              max_steps=1)
    meshed = PyferTrainer(
        TrainConfig(ckpt_dir=str(tmp_path / "cm"), log_dir=str(tmp_path / "lm"),
                    mesh_shape={"data": 2}, **kw),
        model=model(), example_shape=(2, SIZE, SIZE, SIZE, 9))
    meshed.fit(ds, val_ds=ds, resume=False)
    single = PyferTrainer(
        TrainConfig(ckpt_dir=str(tmp_path / "cs"), log_dir=str(tmp_path / "ls"),
                    **kw),
        model=model(), example_shape=(2, SIZE, SIZE, SIZE, 9))
    single.fit(ds, val_ds=ds, resume=False)
    assert np.isfinite(meshed.best_val)
    # identical training (train_mean_loss matches bitwise); the val score
    # tolerance absorbs batch-2-vs-batch-1 forward numerics only
    assert meshed.best_val == pytest.approx(single.best_val, rel=1e-3)

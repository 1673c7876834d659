"""Tests for legacy augmentations, private seg loader, directory scoring."""

import numpy as np
import pytest

from dose_prediction_tpu.data import transforms as T
from dose_prediction_tpu.data.nifti import write_nifti
from dose_prediction_tpu.data.private_seg import (
    PRIVATE_OAR_NAMES,
    PrivateSegDataset,
    load_private_patient,
)
from dose_prediction_tpu.evaluation.metrics import score_prediction_dirs


class AlwaysFire:
    """rng stub that fires every probabilistic branch deterministically."""

    def __init__(self, seed=0):
        self._r = np.random.default_rng(seed)

    def random(self):
        return 0.0

    def integers(self, *a, **k):
        return self._r.integers(*a, **k)

    def uniform(self, a, b):
        return (a + b) / 2


def test_rand_rotate_z_shapes_and_masks(rng):
    vol = rng.standard_normal((8, 16, 16)).astype(np.float32)
    mask = (rng.random((8, 16, 16)) > 0.8).astype(np.float32)
    out = T.rand_rotate_z({"v": vol, "m": mask}, AlwaysFire(),
                          orders={"v": 1, "m": 0}, prob=1.0)
    assert out["v"].shape == vol.shape
    # nearest-rotated mask stays binary
    assert set(np.unique(out["m"])) <= {0.0, 1.0}


def test_rand_rotate_z_zero_angle_identity(rng):
    vol = rng.standard_normal((4, 8, 8)).astype(np.float32)
    out = T.rand_rotate_z({"v": vol}, AlwaysFire(), angles=[0.0], prob=1.0)
    np.testing.assert_allclose(out["v"], vol, atol=1e-5)


def test_rand_translate_preserves_roi(rng):
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    roi = np.zeros((16, 16, 16), np.float32)
    roi[6:10, 6:10, 6:10] = 1
    out = T.rand_translate({"v": vol, "roi": roi}, roi, AlwaysFire(),
                           prob=1.0, max_shift=4)
    assert out["v"].shape == vol.shape
    # the ROI mass is fully preserved (never cropped away)
    assert out["roi"].sum() == roi.sum()


def _write_private_patient(pdir, rng, shape=(10, 20, 20)):
    pdir.mkdir(parents=True, exist_ok=True)
    ct = (rng.standard_normal(shape) * 500).astype(np.int16)
    # loader transposes (2,1,0): write (i,j,k) = (W,H,D)
    write_nifti(pdir / "CT.nii.gz", np.transpose(ct, (2, 1, 0)))
    m = np.zeros(shape, np.uint8)
    m[2:5, 4:8, 4:8] = 1
    write_nifti(pdir / f"{PRIVATE_OAR_NAMES[0]}.nii.gz", np.transpose(m, (2, 1, 0)))


def test_private_patient_loads(tmp_path, rng):
    _write_private_patient(tmp_path / "p0", rng)
    rec = load_private_patient(str(tmp_path / "p0"))
    assert rec["ct"].shape == (128, 128, 128)  # in-plane 128 + depth pad
    assert rec["labels"].shape == (128, 128, 128)
    assert rec["labels"].max() == 1
    assert rec["ct"].min() >= -2048 / 2000 and rec["ct"].max() <= 2500 / 2000


def test_private_dataset_split(tmp_path, rng):
    for i in range(4):
        _write_private_patient(tmp_path / f"p{i}", rng)
    train = PrivateSegDataset(str(tmp_path / "p*"), split="train", val_indices=[1, 3])
    val = PrivateSegDataset(str(tmp_path / "p*"), split="val", val_indices=[1, 3])
    assert len(train) == 2 and len(val) == 2


def test_score_prediction_dirs(tmp_path, rng):
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    for pid in ("pt_0", "pt_1"):
        (gt_dir / pid).mkdir(parents=True)
        (pred_dir / pid).mkdir(parents=True)
        dose = np.abs(rng.standard_normal((12, 12, 12))).astype(np.float32) * 50
        mask = (rng.random((12, 12, 12)) > 0.4).astype(np.uint8)
        ptv = (rng.random((12, 12, 12)) > 0.8).astype(np.uint8)
        write_nifti(gt_dir / pid / "dose.nii.gz", dose)
        write_nifti(gt_dir / pid / "possible_dose_mask.nii.gz", mask)
        write_nifti(gt_dir / pid / "PTV70.nii.gz", ptv)
        write_nifti(pred_dir / pid / "dose.nii.gz", dose + 1.0)  # constant offset
    dose_dif, dvh_dif, metric_means = score_prediction_dirs(str(pred_dir), str(gt_dir))
    assert dose_dif == pytest.approx(1.0, rel=1e-5)
    assert dvh_dif == pytest.approx(1.0, rel=1e-4)
    assert "D1" in metric_means and "mean" in metric_means

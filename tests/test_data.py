"""Data pipeline tests: NIfTI round-trip (validated against torch-free numpy
and the synthetic fixture), OpenKBP preprocessing semantics, augmentation."""

import numpy as np
import pytest

from dose_prediction_tpu.data import nifti
from dose_prediction_tpu.data.openkbp import (
    OAR_NAMES,
    OpenKBPDataset,
    load_patient,
)
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset, make_synthetic_patient
from dose_prediction_tpu.data import transforms as T


def test_nifti_roundtrip(tmp_path, rng):
    vol = rng.standard_normal((7, 9, 11)).astype(np.float32)
    path = tmp_path / "x.nii.gz"
    nifti.write_nifti(path, vol, spacing=(1.5, 2.0, 2.5))
    img = nifti.read_nifti(path)
    np.testing.assert_allclose(img.data, vol)
    assert img.spacing == (1.5, 2.0, 2.5)
    # uncompressed too
    path2 = tmp_path / "y.nii"
    nifti.write_nifti(path2, (vol * 100).astype(np.int16))
    img2 = nifti.read_nifti(path2)
    np.testing.assert_array_equal(img2.data, (vol * 100).astype(np.int16))


def test_nifti_reorient_ras():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    # affine with flipped first axis (L instead of R) and permuted axes
    affine = np.array([
        [0.0, 0.0, -1.0, 3.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    img = nifti.NiftiImage(data=data, affine=affine, spacing=(1, 1, 1))
    assert nifti.orientation_codes(affine) != "RAS"
    out = nifti.reorient_to_ras(img)
    assert nifti.orientation_codes(out.affine) == "RAS"
    # world-space content preserved: corner voxel maps to same world point
    assert out.data.size == data.size


def test_synthetic_patient_loads(tmp_path):
    make_synthetic_patient(tmp_path / "pt_0", shape=(16, 16, 16), seed=1)
    p = load_patient(str(tmp_path / "pt_0"), keep_structures=True)
    assert p.ct.shape == (16, 16, 16)
    assert p.model_input.shape == (16, 16, 16, 9)
    assert p.gt.shape == (16, 16, 16, 2)
    assert p.ct.min() >= -1.024 and p.ct.max() <= 1.5
    assert p.dose.max() <= 70.0 / 70.0 + 0.2
    np.testing.assert_allclose(p.real_dose, p.dose * 70.0, rtol=1e-5)
    assert "PTV70" in p.structures


def test_dataset_missing_structures(tmp_path):
    pattern = make_synthetic_dataset(tmp_path, n_patients=2, shape=(16, 16, 16))
    ds = OpenKBPDataset(pattern, keep_structures=True)
    assert len(ds) == 2
    p1 = ds[1]  # missing PTV63 + Esophagus
    assert "PTV63" not in p1.structures
    # Empty2FullOAR: missing OAR becomes zeros in the stacked channels
    esoph_idx = OAR_NAMES.index("Esophagus")
    assert p1.oars[..., esoph_idx].sum() == 0
    assert p1.model_input.shape[-1] == 9
    # label encoding covers 0..7
    lab = p1.oars_label_encoded
    assert lab.max() <= 7 and lab.min() == 0


def test_ptv_merge_weights(tmp_path):
    make_synthetic_patient(tmp_path / "pt_0", shape=(16, 16, 16), seed=3)
    p = load_patient(str(tmp_path / "pt_0"), keep_structures=True)
    expected = (70 / 70 * p.structures["PTV70"]
                + 63 / 70 * p.structures["PTV63"]
                + 56 / 70 * p.structures["PTV56"])
    np.testing.assert_allclose(p.ptv, expected, rtol=1e-6)


def test_augment_dose_sample_consistency(rng):
    inp = rng.standard_normal((8, 8, 8, 9)).astype(np.float32)
    gt = rng.standard_normal((8, 8, 8, 2)).astype(np.float32)
    # force every transform to fire
    class FireRng:
        def __init__(self):
            self._r = np.random.default_rng(0)
        def random(self):
            return 0.0  # always below prob
        def uniform(self, a, b):
            return 0.05
        def integers(self, *a, **k):
            return self._r.integers(*a, **k)
    out_inp, out_gt = T.augment_dose_sample(inp, gt, FireRng())
    assert out_inp.shape == inp.shape and out_gt.shape == gt.shape
    # flips/rot90 are pure permutations: the value multiset is exactly preserved
    np.testing.assert_array_equal(np.sort(out_gt.ravel()), np.sort(gt.ravel()))
    # intensity shift applied to CT channel only
    assert not np.isclose(out_inp[..., -1].sum(), inp[..., -1].sum(), rtol=1e-7)


def test_rand_crop_pos_neg_bias(rng):
    label = np.zeros((32, 32, 32), np.float32)
    label[20:24, 20:24, 20:24] = 1
    arrays = {"label": label}
    hits = 0
    trials = 60
    for i in range(trials):
        crops = T.rand_crop_pos_neg(arrays, label, np.random.default_rng(i),
                                    spatial_size=(8, 8, 8), num_samples=1)
        assert crops[0]["label"].shape == (8, 8, 8)
        if crops[0]["label"].sum() > 0:
            hits += 1
    # pos=2, neg=1 → about 2/3 of crops contain label voxels
    assert hits > trials * 0.4


def test_dose_batches_wraparound(tmp_path):
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.pipeline import dose_batches

    pattern = make_synthetic_dataset(tmp_path / "wrap", n_patients=2, shape=(16, 16, 16))
    ds = OpenKBPDataset(pattern)
    batches = list(dose_batches(ds, batch_size=1, shuffle=False, augment=False,
                                num_samples_per_epoch=5))
    assert len(batches) == 5  # 2-patient dataset cycled to 5 samples

    # same wraparound semantics on the packed feed, and wired through
    # TrainConfig.samples_per_epoch → _train_batches
    from dose_prediction_tpu.data.packed import packed_dose_batches

    packed = list(packed_dose_batches(ds, batch_size=1, shuffle=False,
                                      augment=False, num_samples_per_epoch=5))
    assert len(packed) == 5

    from dose_prediction_tpu.train.trainers import TrainConfig, _train_batches

    cfg = TrainConfig(samples_per_epoch=5)
    assert len(list(_train_batches(cfg, ds, 0, drop_last=False))) == 5

    # seg feed: wraparound counted in patient visits, num_samples crops each
    from dose_prediction_tpu.data.pipeline import seg_batches

    crops = list(seg_batches(ds, crop=(8, 8, 8), num_samples=2, batch_size=2,
                             shuffle=False, num_samples_per_epoch=3))
    assert sum(b["ct"].shape[0] for b in crops) == 6  # 3 visits x 2 crops


def test_linked_batches(tmp_path):
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.pipeline import linked_batches

    pattern = make_synthetic_dataset(tmp_path, n_patients=2, shape=(16, 16, 16))
    ds = OpenKBPDataset(pattern)
    batches = list(linked_batches(ds, batch_size=1, shuffle=False))
    assert len(batches) == 2
    b = batches[0]
    assert b["input"].shape == (1, 16, 16, 16, 2)   # CT, PTV
    assert b["gt"].shape == (1, 16, 16, 16, 3)      # OARs, dose, mask
    assert b["gt"][..., 0].max() <= 7               # label-encoded OARs


def test_augment_seg_sample(rng):
    ct = rng.standard_normal((20, 20, 20)).astype(np.float32)
    labels = (rng.random((20, 20, 20)) > 0.9).astype(np.float32)
    crops = T.augment_seg_sample(ct, labels, rng, crop=(16, 16, 16), num_samples=4)
    assert len(crops) == 4
    for cvol, clab in crops:
        assert cvol.shape == (16, 16, 16)
        assert clab.shape == (16, 16, 16)

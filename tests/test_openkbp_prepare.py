"""openkbp-prepare: official OpenKBP sparse-CSV release → NIfTI layout
(VERDICT r4 next-round #4). The correctness contract is roundtrip identity:
after conversion, OpenKBPDataset must reproduce the dense CSV volumes
exactly (values, orientation, voxel volume)."""

from __future__ import annotations

import numpy as np
import pytest

from dose_prediction_tpu.data import openkbp_prepare as P
from dose_prediction_tpu.data.openkbp import OAR_NAMES, OpenKBPDataset


def _write_sparse(path, dense, *, mask: bool):
    flat = np.asarray(dense, np.float32).ravel()  # C order
    idx = np.flatnonzero(flat)
    with open(path, "w") as f:
        f.write(",data\n")  # the official pandas-style header
        for i in idx:
            # python-float repr round-trips exactly (f32→f64 is exact)
            f.write(f"{i},\n" if mask else f"{i},{float(flat[i])!r}\n")


@pytest.fixture
def csv_cohort(tmp_path):
    """Two official-format patients with known dense volumes; patient 1 lacks
    PTV63 + Esophagus (real patients miss structures)."""
    rng = np.random.default_rng(7)
    shape = P.SHAPE
    truth = {}
    for pi in range(2):
        pdir = tmp_path / "csv" / f"pt_{pi}"
        pdir.mkdir(parents=True)
        ct = np.zeros(shape, np.float32)
        blob = tuple(slice(40 + pi, 80) for _ in range(3))
        ct[blob] = np.round(rng.uniform(-500, 1200, ct[blob].shape))
        dose = np.zeros(shape, np.float32)
        dose[blob] = rng.uniform(0, 70, dose[blob].shape).astype(np.float32)
        mask = np.zeros(shape, np.uint8)
        mask[blob] = 1
        _write_sparse(pdir / "ct.csv", ct, mask=False)
        _write_sparse(pdir / "dose.csv", dose, mask=False)
        _write_sparse(pdir / "possible_dose_mask.csv", mask, mask=True)
        structures = {}
        for si, name in enumerate(("PTV56", "PTV63", "PTV70") + tuple(OAR_NAMES)):
            if pi == 1 and name in ("PTV63", "Esophagus"):
                continue
            s = np.zeros(shape, np.uint8)
            c = 30 + 6 * si
            s[c:c + 8, c:c + 8, 60:68] = 1
            structures[name] = s
            _write_sparse(pdir / f"{name}.csv", s, mask=True)
        (pdir / "voxel_dimensions.csv").write_text("3.906\n3.906\n2.5\n")
        truth[f"pt_{pi}"] = {"ct": ct, "dose": dose, "mask": mask,
                             "structures": structures}
    return tmp_path / "csv", tmp_path / "nifti", truth


def test_parse_sparse_csv_dialects(tmp_path):
    # value file
    p = tmp_path / "v.csv"
    p.write_text(",data\n5,1.5\n9,-2\n")
    idx, val = P.parse_sparse_csv(p)
    assert idx.tolist() == [5, 9] and val.tolist() == [1.5, -2.0]
    # mask file (empty value column)
    p.write_text(",data\n3,\n4,\n")
    idx, val = P.parse_sparse_csv(p)
    assert idx.tolist() == [3, 4] and val is None
    # bare index rows (no trailing comma) also count as membership
    p.write_text("7\n8\n")
    idx, val = P.parse_sparse_csv(p)
    assert idx.tolist() == [7, 8] and val is None
    # out-of-range index is a clean error
    p.write_text(",data\n99999999,1\n")
    with pytest.raises(ValueError, match="out of range"):
        P.parse_sparse_csv(p)


def test_voxel_dimensions_validation(tmp_path):
    p = tmp_path / "voxel_dimensions.csv"
    p.write_text("3.906\n3.906\n2.5\n")
    assert P.read_voxel_dimensions(p) == (3.906, 3.906, 2.5)
    p.write_text("1.0\n2.0\n")
    with pytest.raises(ValueError):
        P.read_voxel_dimensions(p)
    p.write_text("1.0\n-2.0\n3.0\n")
    with pytest.raises(ValueError):
        P.read_voxel_dimensions(p)


@pytest.mark.slow
def test_prepare_roundtrips_through_the_loader(csv_cohort):
    csv_root, out_root, truth = csv_cohort
    from dose_prediction_tpu.cli.main import main

    rc = main(["openkbp-prepare", "--csv-dir", str(csv_root),
               "--out-dir", str(out_root)])
    assert rc == 0

    ds = OpenKBPDataset(str(out_root / "pt_*"), keep_structures=True)
    assert len(ds.patients) == 2
    for p in ds.patients:
        t = truth[p.patient_id]
        # dose + mask: exact roundtrip of the dense CSV arrays
        np.testing.assert_array_equal(p.real_dose, t["dose"])
        np.testing.assert_array_equal(p.dose_mask, t["mask"].astype(np.float32))
        # ct went through the training transform: clip [-1024,1500] ÷1000
        expect_ct = np.clip(t["ct"], -1024, 1500).astype(np.float32) / 1000.0
        np.testing.assert_allclose(p.ct, expect_ct, atol=1e-6)
        # structures: binary masks survive exactly
        for name, s in t["structures"].items():
            np.testing.assert_array_equal(p.structures[name], s)
        # patient 1's missing structures stay missing (Empty2FullOAR zone)
        if p.patient_id == "pt_1":
            assert "PTV63" not in p.structures
            assert "Esophagus" not in p.structures
        # voxel volume preserved (DVH D0.1cc depends on it)
        assert np.prod(p.spacing) == pytest.approx(3.906 * 3.906 * 2.5)


def test_prepare_rejects_non_patient_dir(tmp_path):
    (tmp_path / "pt_0").mkdir()
    with pytest.raises(FileNotFoundError, match="ct.csv"):
        P.prepare_patient(tmp_path / "pt_0", tmp_path / "out")
    with pytest.raises(FileNotFoundError, match="patient dirs"):
        P.prepare_cohort(tmp_path / "empty_root", tmp_path / "out")


def test_ct_offset(tmp_path):
    pdir = tmp_path / "pt_0"
    pdir.mkdir()
    ct = np.zeros(P.SHAPE, np.float32)
    ct[0, 0, :4] = [0, 1024, 2524, 4000]
    _write_sparse(pdir / "ct.csv", ct, mask=False)
    _write_sparse(pdir / "dose.csv", np.ones(P.SHAPE, np.float32), mask=False)
    _write_sparse(pdir / "possible_dose_mask.csv",
                  np.ones(P.SHAPE, np.uint8), mask=True)
    (pdir / "voxel_dimensions.csv").write_text("3.906\n3.906\n2.5\n")
    P.prepare_patient(pdir, tmp_path / "out", ct_offset=-1024)
    from dose_prediction_tpu.data.nifti import read_nifti

    img = read_nifti(tmp_path / "out" / "CT.nii.gz")
    assert img.data[0, 0, :4].tolist() == [-1024, 0, 1500, 2976]


# -- round-5 review fixes: no silent substitution of corrupt/missing data -----

def test_value_csv_with_missing_cells_is_an_error(tmp_path):
    """A value-carrying CSV (ct/dose) with an empty or 'nan' cell is a corrupt
    download — refusing beats silently writing 1.0 into that voxel."""
    p = tmp_path / "ct.csv"
    p.write_text(",data\n5,1.5\n9,\n")
    with pytest.raises(ValueError, match="missing a value"):
        P.parse_sparse_csv(p)
    p.write_text(",data\n5,1.5\n9,nan\n")
    with pytest.raises(ValueError, match="missing a value"):
        P.parse_sparse_csv(p)
    p.write_text(",data\n5,1.5\n9,inf\n")
    with pytest.raises(ValueError, match="non-finite"):
        P.parse_sparse_csv(p)


def _minimal_patient(pdir):
    pdir.mkdir()
    _write_sparse(pdir / "ct.csv", np.ones(P.SHAPE, np.float32), mask=False)
    _write_sparse(pdir / "dose.csv", np.ones(P.SHAPE, np.float32), mask=False)
    _write_sparse(pdir / "possible_dose_mask.csv",
                  np.ones(P.SHAPE, np.uint8), mask=True)


def test_missing_voxel_dimensions_is_an_error(tmp_path):
    """DVH/D0.1cc depend on the true voxel volume: a patient without
    voxel_dimensions.csv must not convert with a silently fabricated
    spacing."""
    _minimal_patient(tmp_path / "pt_0")
    with pytest.raises(FileNotFoundError, match="assume-spacing"):
        P.prepare_patient(tmp_path / "pt_0", tmp_path / "out")


def test_assume_spacing_converts_with_stated_assumption(tmp_path, capfd):
    from dose_prediction_tpu.data.nifti import read_nifti

    _minimal_patient(tmp_path / "pt_0")
    P.prepare_patient(tmp_path / "pt_0", tmp_path / "out",
                      default_spacing=(2.0, 2.0, 3.0))
    assert "WARNING" in capfd.readouterr().out
    img = read_nifti(tmp_path / "out" / "CT.nii.gz")
    assert tuple(round(float(s), 6) for s in img.spacing) == (2.0, 2.0, 3.0)

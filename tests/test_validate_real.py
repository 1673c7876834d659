"""One-command real-data validation runbook (scripts/validate_real.py),
smoke-tested end-to-end on a synthetic OFFICIAL-FORMAT CSV cohort at a
CI-sized volume: csv → openkbp-prepare → seg-eval + eval + linked-eval →
paper-comparison report. The day real OpenKBP data lands, the same command
runs at 128³/full (VERDICT r4 next-round #4)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
SHAPE = (32, 32, 32)


def _write_sparse(path, dense, *, mask: bool):
    flat = np.asarray(dense, np.float32).ravel()
    idx = np.flatnonzero(flat)
    with open(path, "w") as f:
        f.write(",data\n")
        for i in idx:
            f.write(f"{i},\n" if mask else f"{i},{float(flat[i])!r}\n")


def _make_csv_cohort(root: Path, n=2):
    from dose_prediction_tpu.data.openkbp import OAR_NAMES

    rng = np.random.default_rng(3)
    for pi in range(n):
        pdir = root / f"pt_{pi}"
        pdir.mkdir(parents=True)
        blob = tuple(slice(8, 24) for _ in range(3))
        ct = np.zeros(SHAPE, np.float32)
        ct[blob] = np.round(rng.uniform(-500, 1200, ct[blob].shape))
        dose = np.zeros(SHAPE, np.float32)
        dose[blob] = rng.uniform(0, 70, dose[blob].shape)
        m = np.zeros(SHAPE, np.uint8)
        m[blob] = 1
        _write_sparse(pdir / "ct.csv", ct, mask=False)
        _write_sparse(pdir / "dose.csv", dose, mask=False)
        _write_sparse(pdir / "possible_dose_mask.csv", m, mask=True)
        for si, name in enumerate(("PTV56", "PTV63", "PTV70") + tuple(OAR_NAMES)):
            s = np.zeros(SHAPE, np.uint8)
            c = 6 + 2 * si
            s[c:c + 4, c:c + 4, 14:18] = 1
            _write_sparse(pdir / f"{name}.csv", s, mask=True)
        (pdir / "voxel_dimensions.csv").write_text("3.906\n3.906\n2.5\n")


@pytest.mark.slow
def test_validate_real_runbook_end_to_end(tmp_path):
    env = {**os.environ, "DPT_OPENKBP_SHAPE": "32,32,32",
           "JAX_PLATFORMS": "cpu"}
    _make_csv_cohort(tmp_path / "csv")

    # checkpoints: tiny CLI trains on a prepared copy of the cohort
    from dose_prediction_tpu.cli.main import main

    prep = subprocess.run(
        [sys.executable, "-m", "dose_prediction_tpu", "openkbp-prepare",
         "--csv-dir", str(tmp_path / "csv"), "--out-dir",
         str(tmp_path / "nifti_pre")], cwd=REPO, env=env,
        capture_output=True, text=True)
    assert prep.returncode == 0, prep.stderr
    pattern = str(tmp_path / "nifti_pre" / "pt_*")
    assert main(["train", "transeg", "--data", pattern, "--epochs", "1",
                 "--max-steps", "1", "--model-size", "small", "--roi", "16",
                 "--ckpt-dir", str(tmp_path / "ck_seg"),
                 "--log-dir", str(tmp_path / "lg_seg")]) == 0
    assert main(["train", "pyfer", "--data", pattern, "--epochs", "1",
                 "--max-steps", "1", "--model-size", "small",
                 "--ckpt-dir", str(tmp_path / "ck_dose"),
                 "--log-dir", str(tmp_path / "lg_dose")]) == 0

    # the one command a real-data day runs (subprocess: the real UX)
    proc = subprocess.run(
        [sys.executable, "scripts/validate_real.py",
         "--csv-dir", str(tmp_path / "csv"),
         "--workdir", str(tmp_path / "work"),
         "--seg-ckpt", str(tmp_path / "ck_seg" / "last"),
         "--dose-ckpt", str(tmp_path / "ck_dose" / "last"),
         "--model-size", "small", "--block-family", "seg", "--roi", "16",
         "--platform", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    report = json.loads((tmp_path / "work" / "report.json").read_text())
    assert report["steps"]["prepare"]["patients_converted"] == 2
    assert np.isfinite(report["steps"]["seg_eval"]["dice_metric"])
    assert np.isfinite(report["steps"]["dose_eval"]["mean_dose_score"])
    assert np.isfinite(report["steps"]["linked_eval"]["mean_dose_score"])
    md = (tmp_path / "work" / "report.md").read_text()
    assert "| dose_score_gy |" in md and "2.429" in md  # anchor slots present

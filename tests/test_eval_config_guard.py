"""Round-5 review fixes, batch 3: the eval/serve twin of the resume guard
(a checkpoint scored under a silently different architecture), tune --resume
across a default flip, --assume-spacing validation, step_annotation exception
transparency, and device_prefetch early-abandon release."""

from __future__ import annotations

import json
import threading
import time

import numpy as np
import pytest

from dose_prediction_tpu.cli.main import main
from dose_prediction_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def trained_small_pyfer(tmp_path_factory):
    """One CLI quick-start train run (resume=True default → run_config.json
    recorded) shared by the guard tests."""
    root = tmp_path_factory.mktemp("guard")
    pattern = make_synthetic_dataset(root / "data", n_patients=1)
    rc = main(["train", "pyfer", "--data", pattern, "--epochs", "1",
               "--max-steps", "1", "--model-size", "small",
               "--ckpt-dir", str(root / "ck"), "--log-dir", str(root / "lg")])
    assert rc == 0
    assert (root / "ck" / "run_config.json").exists()
    return root, pattern


def test_eval_refuses_act_mismatch(trained_small_pyfer, monkeypatch):
    """Params are act-independent: evaluating a mish-trained checkpoint as a
    relu model restores cleanly and scores the WRONG architecture — the
    recorded run_config must refuse it."""
    monkeypatch.delenv("DPT_SKIP_CONFIG_CHECK", raising=False)
    root, pattern = trained_small_pyfer
    args = ["eval", "--model", "pyfer", "--data", pattern,
            "--ckpt", str(root / "ck" / "last"), "--model-size", "small",
            "--act", "relu", "--log-dir", str(root / "lg_eval")]
    with pytest.raises(SystemExit, match="act"):
        main(args)
    # the escape hatch lets a deliberate override through
    monkeypatch.setenv("DPT_SKIP_CONFIG_CHECK", "1")
    assert main(args) == 0


def test_eval_matching_config_passes(trained_small_pyfer, monkeypatch):
    monkeypatch.delenv("DPT_SKIP_CONFIG_CHECK", raising=False)
    root, pattern = trained_small_pyfer
    assert main(["eval", "--model", "pyfer", "--data", pattern,
                 "--ckpt", str(root / "ck" / "last"), "--model-size", "small",
                 "--log-dir", str(root / "lg_eval2")]) == 0


def test_tune_resume_refuses_shared_setting_flip(tmp_path):
    """A tune journal records the settings shared by every trial; resuming
    under a flipped default (optimizer adamw→adam8bit) would mix
    incomparable scores into one sampler history."""
    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=1)
    log = tmp_path / "lg"
    log.mkdir()
    (log / "tune_config.json").write_text(json.dumps(
        {"optimizer": "adamw", "model_size": "small",
         "feed_dtype": "float32"}))
    with pytest.raises(SystemExit, match="not comparable"):
        main(["tune", "--data", pattern, "--num-samples", "1",
              "--epochs", "1", "--max-steps", "1", "--model-size", "small",
              "--log-dir", str(log), "--ckpt-dir", str(tmp_path / "ck"),
              "--resume"])


def test_assume_spacing_validation(tmp_path):
    (tmp_path / "csv").mkdir()
    for bad, msg in [("a,b,c", "three numbers"), ("0,0,0", "POSITIVE"),
                     ("1,2", "POSITIVE")]:
        with pytest.raises(SystemExit, match=msg):
            main(["openkbp-prepare", "--csv-dir", str(tmp_path / "csv"),
                  "--out-dir", str(tmp_path / "out"),
                  "--assume-spacing", bad])


def test_step_annotation_propagates_body_exception():
    """A failure inside the annotated body must surface AS ITSELF, not as
    contextlib's 'generator didn't stop after throw()'."""
    from dose_prediction_tpu.utils.profiling import step_annotation

    with pytest.raises(ValueError, match="real error"):
        with step_annotation("step"):
            raise ValueError("real error")


def test_device_prefetch_releases_worker_on_early_abandon():
    """Breaking out of the prefetch generator early (cfg.max_steps) must stop
    the worker — a blocking put would otherwise pin `size` device-resident
    batches in memory for the rest of the process."""
    from dose_prediction_tpu.data.pipeline import device_prefetch

    produced = []

    def src():
        for i in range(1000):
            produced.append(i)
            yield {"x": np.full((2, 2), i, np.float32)}

    gen = device_prefetch(src(), size=2)
    next(gen)
    gen.close()                       # the early-abandon path
    time.sleep(0.5)                   # worker gets its 0.1 s poll cycles
    n_after_close = len(produced)
    time.sleep(0.5)
    assert len(produced) == n_after_close  # worker actually stopped
    assert n_after_close <= 6               # ≈ size + in-flight, not 1000

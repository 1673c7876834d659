"""Resume-safety guard (round-5 review findings): a checkpoint directory
holding work the current configuration cannot continue must REFUSE to resume
(raising, not silently starting fresh and rotating the old slots away).

Two hazards are covered:
- graph-determining settings drift (run_config.json sidecar): e.g. the CLI's
  pyfer optimizer default flipping adamw→adam8bit, or act relu→mish — params
  restore cleanly, so without the sidecar the run silently trains/serves a
  different graph over the old weights;
- structural mismatch: checkpoints exist but none restore against the current
  state template (the old behavior warned and OVERWROTE).

DPT_FRESH_ON_MISMATCH=1 is the deliberate-discard escape hatch.
"""

from __future__ import annotations

import numpy as np
import pytest

from dose_prediction_tpu.core import checkpoint as C
from dose_prediction_tpu.train.trainers import (
    TrainConfig,
    _resume_guard_config,
    _try_resume,
)


def _mgr(tmp_path):
    return C.CheckpointManager(tmp_path / "ckpt", monitor="loss", mode="min")


def test_run_config_sidecar_roundtrip(tmp_path):
    mgr = _mgr(tmp_path)
    assert mgr.read_run_config() is None
    spec = {"optimizer": "adamw", "models": [{"model": "DosePyfer",
                                              "config": {"act": "relu"}}]}
    mgr.write_run_config(spec)
    assert mgr.read_run_config() == spec


def test_resume_refuses_run_config_flip(tmp_path, monkeypatch):
    """The VERDICT-#2 scenario: a run trained under optimizer=adamw, resumed
    after the default flipped to adam8bit — must raise, not overwrite."""
    monkeypatch.delenv("DPT_FRESH_ON_MISMATCH", raising=False)
    mgr = _mgr(tmp_path)
    mgr.write_run_config({"optimizer": "adamw"})
    with pytest.raises(RuntimeError, match="different graph-determining"):
        _try_resume(mgr, {"epoch": 0}, run_config={"optimizer": "adam8bit"})
    # the recorded config was NOT stomped by the refused attempt
    assert mgr.read_run_config() == {"optimizer": "adamw"}


def test_resume_fresh_on_mismatch_escape(tmp_path, monkeypatch, capfd):
    monkeypatch.setenv("DPT_FRESH_ON_MISMATCH", "1")
    mgr = _mgr(tmp_path)
    mgr.write_run_config({"optimizer": "adamw"})
    restored, epoch = _try_resume(mgr, {"epoch": 0},
                                  run_config={"optimizer": "adam8bit"})
    assert restored is None and epoch == 0
    assert "starting FRESH" in capfd.readouterr().out
    # the deliberate fresh start re-records the NEW config
    assert mgr.read_run_config() == {"optimizer": "adam8bit"}


def test_resume_matching_config_restores_and_records(tmp_path, monkeypatch):
    monkeypatch.delenv("DPT_FRESH_ON_MISMATCH", raising=False)
    mgr = _mgr(tmp_path)
    tree = {"state": {"w": np.arange(4.0, dtype=np.float32)}, "epoch": 2}
    mgr.save_last(tree)
    mgr.wait()
    spec = {"optimizer": "adamw"}
    mgr.write_run_config(spec)
    template = {"state": {"w": np.zeros(4, np.float32)}, "epoch": 0}
    restored, epoch = _try_resume(mgr, template, run_config=spec)
    assert epoch == 3
    np.testing.assert_array_equal(restored["state"]["w"], tree["state"]["w"])


def test_fresh_dir_records_run_config(tmp_path, monkeypatch):
    """First resume=True fit on an empty dir: nothing to restore, config
    recorded so the NEXT launch is guarded."""
    monkeypatch.delenv("DPT_FRESH_ON_MISMATCH", raising=False)
    mgr = _mgr(tmp_path)
    spec = {"optimizer": "adam8bit"}
    restored, epoch = _try_resume(mgr, {"epoch": 0}, run_config=spec)
    assert restored is None and epoch == 0
    assert mgr.read_run_config() == spec


def test_resume_refuses_unrestorable_checkpoints(tmp_path, monkeypatch):
    """Pre-sidecar runs (no run_config.json): a structural mismatch — the old
    slots exist but none restore against the template — must raise instead of
    the old warn-and-overwrite."""
    monkeypatch.delenv("DPT_FRESH_ON_MISMATCH", raising=False)
    mgr = _mgr(tmp_path)
    mgr.save_last({"state": {"old_layout": np.zeros(3, np.float32)},
                   "epoch": 0})
    mgr.wait()
    template = {"state": {"new_layout": np.zeros((2, 2), np.float32)},
                "epoch": 0}
    with pytest.raises(RuntimeError, match="DPT_FRESH_ON_MISMATCH"):
        _try_resume(mgr, template)
    monkeypatch.setenv("DPT_FRESH_ON_MISMATCH", "1")
    restored, epoch = _try_resume(mgr, template)
    assert restored is None and epoch == 0


def test_resume_guard_config_contents():
    """The guard pins exactly the silent-wrongness knobs: optimizer family +
    every model-constructor field (act included) — NOT lr/wd (retuning across
    resumes is a legitimate reference workflow, train_light_pyfer.py:343)."""
    from dose_prediction_tpu.models import DosePyfer

    cfg = TrainConfig(optimizer="adam8bit", learning_rate=3e-4)
    spec = _resume_guard_config(cfg, DosePyfer(act="mish"))
    assert spec["optimizer"] == "adam8bit"
    assert spec["models"][0]["model"] == "DosePyfer"
    assert spec["models"][0]["config"]["act"] == "mish"
    assert "learning_rate" not in str(spec.keys())
    # act flip alone changes the canonical encoding (finding #3: params are
    # act-independent, so only this record can catch it)
    spec_relu = _resume_guard_config(cfg, DosePyfer(act="relu"))
    assert spec != spec_relu

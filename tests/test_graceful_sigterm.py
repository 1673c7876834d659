"""Preemption-graceful shutdown: SIGTERM during fit must checkpoint and exit
cleanly (preemptible TPU fleets deliver SIGTERM ahead of eviction)."""

import os
import signal
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    """Fit a long run in a subprocess, SIGTERM it once the 'last' slot
    exists: the process must exit 0 (graceful path, not the default killed
    exit), print the handler's notice, and leave a restorable 'last' slot."""
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {str(REPO)!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        from dose_prediction_tpu.data.openkbp import OpenKBPDataset
        from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
        from dose_prediction_tpu.models import CascadeC3D
        from dose_prediction_tpu.train.trainers import (
            CascadeC3DTrainer, TrainConfig)

        pattern = make_synthetic_dataset(
            {str(tmp_path / "data")!r}, n_patients=2, shape=(32, 32, 32))
        ds = OpenKBPDataset(pattern)
        cfg = TrainConfig(max_epochs=10000, check_val=100000,
                          learning_rate=1e-3,
                          ckpt_dir={str(tmp_path / "ckpt")!r},
                          log_dir={str(tmp_path / "logs")!r})
        model = CascadeC3D(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                           list_ch_B=(-1, 2, 4, 8, 16, 32))
        tr = CascadeC3DTrainer(cfg, model=model,
                               example_shape=(1, 32, 32, 32, 9))
        tr.fit(ds, val_ds=None)
        print("FIT_RETURNED_CLEANLY", flush=True)
    """)
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    last_dir = tmp_path / "ckpt" / "last"
    deadline = time.time() + 420
    try:
        while time.time() < deadline and not last_dir.exists():
            if proc.poll() is not None:
                out = proc.stdout.read()
                pytest.fail(f"trainer exited before the first epoch:\n{out}")
            time.sleep(1.0)
        assert last_dir.exists(), "no 'last' slot appeared within the budget"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, f"non-graceful exit {proc.returncode}:\n{out}"
    assert "SIGTERM received" in out
    assert "FIT_RETURNED_CLEANLY" in out
    assert last_dir.exists()

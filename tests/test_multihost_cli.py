"""CLI-level multi-host: `--multihost --coordinator ...` joins the runtime
before training, so the same command line on every host trains one model."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from dose_prediction_tpu.cli.main import build_parser

REPO = Path(__file__).resolve().parents[1]


def test_parser_multihost_flags():
    ap = build_parser()
    args = ap.parse_args(["--multihost", "--coordinator", "h:1",
                          "--num-processes", "2", "--process-id", "1",
                          "train", "pyfer", "--data", "x"])
    assert args.multihost and args.coordinator == "h:1"
    assert args.num_processes == 2 and args.process_id == 1
    args = ap.parse_args(["eval", "--data", "x", "--ckpt", "c"])
    assert args.multihost is False


def test_multihost_tune_rejected():
    """HPO parallelizes trials across LOCAL devices; combining it with the
    process-spanning runtime is undefined — the CLI must refuse clearly."""
    from dose_prediction_tpu.cli.main import main

    with pytest.raises(SystemExit, match="does not compose with tune"):
        main(["--multihost", "tune", "--data", "x"])


@pytest.mark.slow
def test_cli_two_process_train(tmp_path):
    """The SAME CLI command on two processes (ranks differ) trains one dp=2
    model: lockstep losses, one coordinated checkpoint."""
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset

    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2,
                                     shape=(32, 32, 32))
    port = str(54700 + os.getpid() % 500)
    env = dict(os.environ)
    # the test harness forces 8 virtual CPU devices via XLA_FLAGS; the
    # workers must see ONE device each or the dp=2 mesh lands on one process
    env.pop("XLA_FLAGS", None)
    def cmd(pid):
        return [sys.executable, "-m", "dose_prediction_tpu",
                "--platform", "cpu", "--multihost",
                "--coordinator", f"127.0.0.1:{port}", "--num-processes", "2",
                "--process-id", str(pid),      # global flags precede the cmd
                "train", "pyfer", "--data", pattern, "--model-size", "small",
                "--mesh", "data=2", "--batch-size", "2", "--epochs", "1",
                "--check-val", "50",
                "--ckpt-dir", str(tmp_path / "ckpt"),
                "--log-dir", str(tmp_path / "logs")]
    env["PYTHONPATH"] = str(REPO)
    procs = [subprocess.Popen(cmd(pid), stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env,
                              cwd=str(REPO))
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("CLI multihost worker hung")
        outs.append(out)
        assert p.returncode == 0, out
    assert (tmp_path / "ckpt" / "last").exists()
    # both ranks logged the same step-1 loss (lockstep dp)
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if "train_mean_loss=" in ln]
        assert lines, out
        losses.append(lines[-1].split("train_mean_loss=")[1].split()[0])
    assert losses[0] == losses[1]
    assert np.isfinite(float(losses[0]))

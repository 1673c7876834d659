"""bench.py device-watchdog behavior (driven live against hung/dead tunnels
during round 4; these tests pin the logic on CPU so regressions surface
without a TPU)."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_watchdog_healthy_cpu_probe_returns():
    """platform passthrough: with a forced 'cpu' backend the probe subprocess
    must answer quickly even where the env-level JAX_PLATFORMS is overridden
    by a site hook (the CLI --platform cpu path)."""
    bench._device_watchdog(timeout_s=90.0, platform="cpu")  # returns or raises


def test_watchdog_subprocess_failure_emits_structured_record(monkeypatch, capfd):
    """A probe-process FAILURE (not a hang) is retried once, then reported as
    a structured JSON line labeled distinctly from 'unresponsive', with the
    last good measurement attached."""
    monkeypatch.setattr(bench.sys, "executable", "/bin/false")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # skip the retry wait

    def fake_exit(code):
        raise SystemExit(code)

    monkeypatch.setattr(bench.os, "_exit", fake_exit)
    with pytest.raises(SystemExit) as exc:
        bench._device_watchdog(timeout_s=30.0)
    assert exc.value.code == 2
    out = capfd.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["value"] is None
    assert "not a hang" in rec["error"]
    # the persisted last-good measurement rides along so a dead device at
    # bench time doesn't erase the round's numbers; compare against the file
    # itself (a live bench run may have refreshed it since the last commit)
    persisted = json.loads(
        (Path(bench.__file__).parent / "artifacts" / "last_bench.json").read_text()
    )
    assert rec["last_good_run"]["value"] == pytest.approx(persisted["value"])
    assert rec["last_good_run"]["value"] > 0

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


def test_watchdog_subprocess_failure_emits_structured_record(
        monkeypatch, capfd, tmp_path):
    """A probe-process FAILURE (not a hang) is retried once, then reported as
    a structured JSON line labeled distinctly from 'unresponsive', with the
    last good measurement attached. Hermetic: LAST_GOOD points at a tmp file
    holding a known sentinel, so the assertion verifies the attached record's
    CONTENT, not just the attachment plumbing (a corrupted persisted value
    would surface here)."""
    sentinel = {"metric": "cascade_128_p50_latency", "value": 0.123456,
                "unit": "s/patient", "measured_at": "2026-01-01T00:00:00"}
    last_good = tmp_path / "last_bench.json"
    last_good.write_text(json.dumps(sentinel))
    monkeypatch.setattr(bench, "LAST_GOOD", last_good)
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
    assert rec["last_good_run"] == sentinel

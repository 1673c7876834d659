"""`doctor` subcommand: deployment health report.

The AOT/cache mitigation stack degrades silently (a stale artifact = a
minutes-long recompile announced only on stderr; a spec-drifted train
artifact = silently unreachable). These tests pin that doctor classifies
each condition correctly, hermetically — artifact dirs, cache dir and the
"running runtime" are all injected."""

import gzip
import json
import pickle
from pathlib import Path

import pytest

from dose_prediction_tpu.cli import doctor as D
from dose_prediction_tpu.infer import aot as A

NOW = {"jax": "0.9.0", "jaxlib": "0.9.0", "libtpu": "libtpu 1.2.3",
       "device_kind": "TPU v5 lite"}


def test_artifact_status_classification():
    assert D.artifact_status(None, NOW)[0] == "no-sidecar"
    ok_sc = {"built": dict(NOW), "built_at": "2026-08-19T00:00:00"}
    status, detail = D.artifact_status(ok_sc, NOW)
    assert status == "ok" and "2026-08-19" in detail
    stale_sc = {"built": {**NOW, "libtpu": "libtpu 0.0.1"}}
    status, detail = D.artifact_status(stale_sc, NOW)
    assert status == "stale"
    assert "built for libtpu 0.0.1" in detail and "libtpu 1.2.3" in detail


def _fake_artifact(directory: Path, name: str, *, built=None, spec=None,
                   gz=False):
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / (f"{name}.pkl.gz" if gz else f"{name}.pkl")
    if gz:
        with gzip.open(path, "wb") as f:
            pickle.dump(("payload",), f)
    else:
        path.write_bytes(pickle.dumps(("payload",)))
    if built is not None:
        sc = {"built": built, "built_at": "2026-08-19T00:00:00",
              "size_bytes": path.stat().st_size, "rebuild_with": "scripts/x.py"}
        if spec is not None:
            sc["spec"] = spec
        A._sidecar_path(path).write_text(json.dumps(sc))
    return path


def test_dir_artifacts_statuses_and_gz(tmp_path):
    _fake_artifact(tmp_path, "fresh", built=dict(NOW))
    _fake_artifact(tmp_path, "stale", built={**NOW, "jax": "0.8.0"}, gz=True)
    _fake_artifact(tmp_path, "orphan")  # no sidecar
    arts = D._dir_artifacts(tmp_path, NOW)
    assert arts["fresh"]["status"] == "ok"
    assert arts["stale"]["status"] == "stale"
    assert arts["orphan"]["status"] == "no-sidecar"
    # spec kind surfaces for train-style sidecars
    _fake_artifact(tmp_path, "trainy", built=dict(NOW),
                   spec={"kind": "pyfer", "learning_rate": 1e-4})
    assert D._dir_artifacts(tmp_path, NOW)["trainy"]["spec_kind"] == "pyfer"


def test_collect_report_and_render_hermetic(tmp_path, monkeypatch):
    serve = tmp_path / "serve"
    train = tmp_path / "train"
    cache = tmp_path / "cache"
    monkeypatch.setenv("DPT_AOT_DIR", str(serve))
    monkeypatch.setenv("DPT_TRAIN_AOT_DIR", str(train))
    monkeypatch.setenv("DPT_CACHE_DIR", str(cache))
    _fake_artifact(serve, "stage1", built=dict(NOW))
    _fake_artifact(serve, "stage2", built={**NOW, "device_kind": "TPU v6"})
    # a train artifact with a real quick-start spec → reachable; one with a
    # made-up spec → provenance ok but unreachable (the silent-unreachable
    # failure mode the round-5 regression test caught)
    reachable = D.quickstart_spec_keys()
    stem, spec = next(iter(reachable.items()))
    _fake_artifact(train, stem, built=dict(NOW), spec=spec)
    _fake_artifact(train, "pyfer-deadbeef0000", built=dict(NOW),
                   spec={"kind": "pyfer", "learning_rate": 999.0})

    report = D.collect_report(now=dict(NOW))
    arts = report["train_aot"]["artifacts"]
    assert arts[stem]["quickstart_reachable"] is True
    assert arts["pyfer-deadbeef0000"]["quickstart_reachable"] is False
    assert report["serve_aot"]["artifacts"]["stage2"]["status"] == "stale"

    lines, warns = D.render(report)
    text = "\n".join(lines)
    # stale serve artifact and unreachable train artifact both warn
    assert "[warn] serve_aot/stage2" in text
    assert "[warn] train_aot/pyfer-deadbeef0000" in text
    assert "quick-start" in text
    assert f"[ok]   train_aot/{stem}" in text
    assert warns >= 2
    # report is JSON-able as the --json path requires
    json.dumps(report, default=str)


def test_render_flags_disabled_knobs(tmp_path, monkeypatch):
    monkeypatch.setenv("DPT_AOT_DIR", str(tmp_path / "nope"))
    monkeypatch.setenv("DPT_TRAIN_AOT_DIR", str(tmp_path / "nope2"))
    monkeypatch.setenv("DPT_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv("DPT_NO_AOT", "1")
    monkeypatch.setenv("DPT_NO_CACHE", "1")
    lines, warns = D.render(D.collect_report(now=dict(NOW)))
    text = "\n".join(lines)
    assert "DPT_NO_CACHE=1" in text and "DPT_NO_AOT=1" in text
    assert warns >= 3


def test_check_data_pattern(tmp_path):
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset

    pattern = make_synthetic_dataset(tmp_path / "data", n_patients=2)
    rec = D.check_data_pattern(pattern)
    assert rec["patients"] == 2 and rec["issues"] == []

    # a patient dir missing its CT must be called out by name
    bad = tmp_path / "bad" / "pt_9"
    bad.mkdir(parents=True)
    rec = D.check_data_pattern(str(tmp_path / "bad" / "pt_*"))
    assert rec["patients"] == 1
    assert any("pt_9" in s and "CT" in s for s in rec["issues"])

    assert D.check_data_pattern(str(tmp_path / "nothing*"))["patients"] == 0


def test_subprocess_probe_success_on_cpu():
    """--probe runs the device op in a killable subprocess and returns the
    device facts, so the parent never touches a possibly-dead backend."""
    rec = D._subprocess_probe(timeout_s=120.0, platform="cpu")
    assert "probe_error" not in rec, rec
    assert rec["platform"] == "cpu" and rec["device_count"] >= 1
    assert rec["probe_s"] > 0


def test_subprocess_probe_hang_and_failure_paths(monkeypatch):
    """A probe that outlives its budget reports 'unresponsive' (the dead-
    tunnel signature: blocked in C holding the GIL, only killable from
    outside); a probe-process FAILURE is labeled distinctly."""
    # interpreter startup alone exceeds a 50 ms budget → TimeoutExpired path
    rec = D._subprocess_probe(timeout_s=0.05, platform="cpu")
    assert "unresponsive" in rec["probe_error"]

    monkeypatch.setattr(D.sys, "executable", "/bin/false")
    rec = D._subprocess_probe(timeout_s=30.0, platform="cpu")
    assert "not a hang" in rec["probe_error"]

    # _backend(probe=True) downgrades to unknowns instead of touching jax
    b = D._backend(True, probe_timeout=0.05, platform="cpu")
    assert b["platform"] == "unknown" and b["device_count"] == 0
    lines, warns = D.render({
        "versions": {"jax": "0.9.0"}, "backend": b,
        "native_io": {"available": True, "lib": "x", "toolchain_gxx": True},
        "compile_cache": {"dir": "x", "disabled": True, "exists": False,
                          "seed_entries_shipped": 0, "seed_entries_present": 0},
        "serve_aot": {"dir": "x", "disabled": True, "artifacts": {}},
        "train_aot": {"dir": "x", "disabled": True, "artifacts": {}},
    })
    assert any("probe FAILED" in ln for ln in lines) and warns >= 1


def test_cli_doctor_end_to_end(tmp_path, monkeypatch, capsys):
    """`doctor --json` runs on the CPU backend and exits 0; `--strict` turns
    an induced warning (empty artifact dirs) into exit 1."""
    from dose_prediction_tpu.cli.main import main

    monkeypatch.setenv("DPT_AOT_DIR", str(tmp_path / "empty_serve"))
    monkeypatch.setenv("DPT_TRAIN_AOT_DIR", str(tmp_path / "empty_train"))
    monkeypatch.setenv("DPT_CACHE_DIR", str(tmp_path / "cache"))
    assert main(["doctor", "--json"]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["backend"]["device_count"] >= 1
    assert report["versions"]["jax"] != "missing"

    assert main(["doctor"]) == 0          # warnings alone don't fail
    capsys.readouterr()
    assert main(["doctor", "--strict"]) == 1

    # doctor must NOT create the compile-cache dir it reports on
    assert not (tmp_path / "cache").exists()

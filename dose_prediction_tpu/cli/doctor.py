"""`python -m dose_prediction_tpu doctor` — one-shot deployment health report.

Why this exists: the framework's performance story rests on layered
mitigations (shipped AOT executables → persistent compile cache → cold
compile) that all degrade *silently* — a stale serve artifact costs minutes
of recompile with only a stderr line, a train artifact whose spec drifted
from the CLI defaults is silently unreachable, a missing native .so quietly
falls back to the numpy feed. doctor surfaces every such precondition BEFORE
a run, in one report:

  versions        python/numpy/jax/jaxlib/flax/optax/orbax/libtpu
  backend         platform, device kinds, optional live-probe latency
  native IO       libdose_io.so availability + toolchain presence
  compile cache   live dir state + shipped seed coverage
  serve_aot       per-artifact provenance vs the running runtime
  train_aot       ditto + "does any CLI quick-start actually reach it"
  data (optional) patient-dir glob sanity for a --data pattern

The reference has no analogue (its preflight was the user reading stack
traces); the closest behavior anchors are the placeholder paths the user
must hand-edit in /root/reference/DosePrediction/Train/config.py:9,46 —
exactly the class of misconfiguration this command catches up front.

Pure-report design: ``collect_report()`` returns a JSON-able dict and does
not mutate anything; ``render()`` turns it into [ok]/[warn] lines. Exit code
is 0 unless ``--strict`` and warnings exist.
"""

from __future__ import annotations

import os
import platform as _platform
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from dose_prediction_tpu.infer import aot as A

_REPO = Path(__file__).resolve().parents[2]


# ---------------------------------------------------------------------------
# pure helpers (unit-testable without a device)
# ---------------------------------------------------------------------------

def artifact_status(sidecar: Optional[dict], now: dict) -> Tuple[str, str]:
    """Classify one artifact's provenance sidecar against the running
    runtime. Returns (status, detail) with status in {'ok','stale',
    'no-sidecar'} — mirrors infer.aot._staleness_hint but as data, so the
    report can aggregate instead of grepping stderr."""
    if sidecar is None:
        return "no-sidecar", "no provenance sidecar; rebuild to record one"
    built = sidecar.get("built", {})
    diffs = [f"{k}: built for {built.get(k, '?')}, running {now.get(k, '?')}"
             for k in ("jax", "jaxlib", "libtpu", "device_kind")
             if built.get(k) != now.get(k)]
    if diffs:
        return "stale", "; ".join(diffs)
    return "ok", f"built {sidecar.get('built_at', '?')} for this runtime"


def _dir_artifacts(directory: Path, now: dict) -> Dict[str, dict]:
    """{stem: {status, detail, size_mb, built_at, spec_kind?}} for every
    artifact in a serve/train AOT directory (gz-aware, matching the loader's
    plain-wins-on-collision preference via artifact_manifest's ordering)."""
    out: Dict[str, dict] = {}
    if not directory.is_dir():
        return out
    for pkl in sorted(directory.glob("*.pkl")) + sorted(directory.glob("*.pkl.gz")):
        stem = pkl.name[:-7] if pkl.name.endswith(".pkl.gz") else pkl.stem
        if stem in out:
            continue
        sc = A.read_sidecar(pkl)
        status, detail = artifact_status(sc, now)
        rec = {"status": status, "detail": detail,
               "size_mb": round(pkl.stat().st_size / 1e6, 1),
               "built_at": (sc or {}).get("built_at", "unknown")}
        spec = (sc or {}).get("spec")
        if isinstance(spec, dict):
            rec["spec_kind"] = spec.get("kind", "?")
        out[stem] = rec
    return out


def quickstart_spec_keys() -> Dict[str, dict]:
    """{'<kind>-<speckey>': spec} for every bare CLI quick-start train config
    (the same enumeration tests/test_bootstrap_aot.py pins the shipped
    artifacts to). A train artifact whose stem is NOT in this set is
    unreachable from `python -m dose_prediction_tpu train <kind>` without
    extra flags."""
    from dose_prediction_tpu.cli.main import (
        _DEFAULT_LR,
        default_flagship_model,
        default_seg_model,
        resolve_optimizer,
    )
    from dose_prediction_tpu.train.trainers import TrainConfig

    expected: Dict[str, dict] = {}
    for kind, model, shape, feeds in (
            ("pyfer", default_flagship_model(), (1, 128, 128, 128, 9),
             ("float32", "packed")),
            ("transeg", default_seg_model(), (1, 96, 96, 96, 1),
             ("float32",))):
        for feed in feeds:
            cfg = TrainConfig(learning_rate=_DEFAULT_LR,
                              optimizer=resolve_optimizer(None, kind),
                              feed_dtype=feed)
            spec = A.train_spec(kind, cfg, model, shape)
            expected[f"{kind}-{A.spec_key(spec)}"] = spec
    return expected


def check_data_pattern(pattern: str, *, max_detail: int = 3) -> dict:
    """Host-only sanity of a --data glob: how many patient dirs match, and
    which required volumes the first few are missing. CT.nii.gz is the only
    hard requirement (data/openkbp.py:114 raises without it); dose/mask are
    needed for training/scoring, PTVs/OARs may legitimately be absent
    (Empty2FullOAR semantics, dataloader_OpenKBP_monai.py:84-95)."""
    from dose_prediction_tpu.data.openkbp import (
        OAR_NAMES,
        PTV_NAMES,
        find_patients,
    )

    dirs = find_patients(pattern)
    rec: dict = {"pattern": pattern, "patients": len(dirs), "issues": []}
    for d in dirs[:max_detail]:
        pdir = Path(d)
        missing_hard = [n for n in ("CT", "dose", "possible_dose_mask")
                        if not (pdir / f"{n}.nii.gz").exists()]
        if missing_hard:
            rec["issues"].append(
                f"{pdir.name}: missing {', '.join(missing_hard)}.nii.gz")
        elif not any((pdir / f"{n}.nii.gz").exists()
                     for n in PTV_NAMES + OAR_NAMES):
            rec["issues"].append(
                f"{pdir.name}: no PTV or OAR volumes at all (structure "
                f"channels would be empty)")
    return rec


# ---------------------------------------------------------------------------
# report assembly
# ---------------------------------------------------------------------------

def _versions() -> Dict[str, str]:
    import importlib.metadata as im

    out = {"python": _platform.python_version()}
    for dist in ("numpy", "jax", "jaxlib", "flax", "optax", "orbax-checkpoint"):
        try:
            out[dist] = im.version(dist)
        except Exception:
            out[dist] = "missing"
    return out


def _subprocess_probe(timeout_s: float, platform: Optional[str]) -> dict:
    """Probe the device in a SUBPROCESS with a hard deadline. A dead axon
    tunnel BLOCKS inside a C call holding the GIL (observed hung for hours,
    docs/ROUND_NOTES.md), so an in-process probe — or even jax.devices() —
    could hang doctor itself; the subprocess is killable. Mirrors
    bench._device_watchdog, but returns the device facts on success so the
    parent process never has to touch the backend at all."""
    import json as _json
    import subprocess

    force = (f"import jax; jax.config.update('jax_platforms', '{platform}'); "
             if platform else "")
    probe = [sys.executable, "-c",
             force + "import json, jax, jax.numpy as jnp; "
             "d = jax.devices(); "
             "float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))); "
             "print(json.dumps({'platform': d[0].platform, "
             "'device_count': len(d), "
             "'device_kinds': sorted({x.device_kind for x in d})}))"]
    t0 = time.perf_counter()
    try:
        out = subprocess.run(probe, check=True, capture_output=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"probe_error": f"device unresponsive: probe did not complete "
                               f"in {timeout_s:.0f}s (dead or very cold "
                               f"tunnel; --probe-timeout raises the budget)"}
    except subprocess.CalledProcessError as e:
        return {"probe_error": "probe subprocess failed (not a hang): "
                               + e.stderr.decode(errors="replace")[-300:]}
    rec = _json.loads(out.stdout.strip().splitlines()[-1])
    rec["probe_s"] = round(time.perf_counter() - t0, 3)
    return rec


def _backend(probe: bool, *, probe_timeout: float = 600.0,
             platform: Optional[str] = None) -> dict:
    if probe:
        # all device facts come from the killable subprocess; on failure the
        # parent deliberately reports unknowns rather than risking a hang
        rec = _subprocess_probe(probe_timeout, platform)
        if "probe_error" in rec:
            rec.setdefault("platform", "unknown")
            rec.setdefault("device_count", 0)
            rec.setdefault("device_kinds", ["unknown"])
        return rec
    rec: dict = {}
    try:
        import jax

        devs = jax.devices()
        rec["platform"] = devs[0].platform if devs else "none"
        rec["device_count"] = len(devs)
        rec["device_kinds"] = sorted({d.device_kind for d in devs})
    except Exception as e:
        rec["error"] = f"{type(e).__name__}: {e}"
    return rec


def _native_io() -> dict:
    import shutil as _shutil

    from dose_prediction_tpu.data import native as N

    return {"available": N.native_available(),
            "lib": str(N._LIB_PATH) if N._LIB_PATH.exists() else "missing",
            "toolchain_gxx": _shutil.which("g++") is not None}


def _compile_cache() -> dict:
    from dose_prediction_tpu.core import bootstrap as B

    d = B.cache_dir()
    rec: dict = {"dir": str(d), "disabled": os.environ.get("DPT_NO_CACHE") == "1",
                 "exists": d.is_dir()}
    if d.is_dir():
        entries = [p for p in d.iterdir() if not p.name.startswith(".")]
        rec["entries"] = len(entries)
        rec["size_mb"] = round(sum(p.stat().st_size for p in entries
                                   if p.is_file()) / 1e6, 1)
    shipped = present = 0
    for seed_dir in B.SEED_DIRS:
        if seed_dir.is_dir():
            for src in seed_dir.glob("*-cache"):
                shipped += 1
                present += int((d / src.name).exists())
    rec["seed_entries_shipped"] = shipped
    rec["seed_entries_present"] = present
    return rec


def collect_report(*, data: Optional[str] = None, probe: bool = False,
                   probe_timeout: float = 600.0,
                   platform: Optional[str] = None,
                   now: Optional[dict] = None) -> dict:
    """Assemble the full report. ``now`` (the running build_info) is
    injectable for tests; by default it is computed live — via jax.devices()
    in-process, or entirely from the subprocess probe when ``probe`` is set
    (so a dead tunnel can never hang the report)."""
    backend = _backend(probe, probe_timeout=probe_timeout, platform=platform)
    report: dict = {
        "versions": _versions(),
        "backend": backend,
        "native_io": _native_io(),
        "compile_cache": _compile_cache(),
    }
    if now is None:
        try:
            kind = backend["device_kinds"][0] if probe else None
            now = A.build_info(device_kind=kind)
        except Exception as e:
            now = {"error": f"{type(e).__name__}: {e}"}
    report["runtime"] = now
    report["serve_aot"] = {"dir": str(A.aot_dir()),
                           "disabled": os.environ.get("DPT_NO_AOT") == "1",
                           "artifacts": _dir_artifacts(A.aot_dir(), now)}
    train = _dir_artifacts(A.train_aot_dir(), now)
    try:
        reachable = quickstart_spec_keys()
        for stem, rec in train.items():
            base = stem[:-5] if stem.endswith("-init") else stem
            rec["quickstart_reachable"] = base in reachable
    except Exception as e:  # model construction failure should not kill doctor
        report["quickstart_error"] = f"{type(e).__name__}: {e}"
    report["train_aot"] = {"dir": str(A.train_aot_dir()),
                           "disabled": os.environ.get("DPT_NO_AOT") == "1",
                           "artifacts": train}
    if data:
        report["data"] = check_data_pattern(data)
    return report


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------

def render(report: dict) -> Tuple[List[str], int]:
    """(lines, n_warnings). Every non-ok condition is a [warn] line with the
    remediation inline — the report should never need a follow-up grep."""
    lines: List[str] = []
    warns = 0

    def ok(msg: str) -> None:
        lines.append(f"[ok]   {msg}")

    def warn(msg: str) -> None:
        nonlocal warns
        warns += 1
        lines.append(f"[warn] {msg}")

    v = report["versions"]
    missing = [k for k, val in v.items() if val == "missing"]
    (warn if missing else ok)(
        "versions: " + ", ".join(f"{k} {val}" for k, val in v.items())
        + (f" — MISSING: {', '.join(missing)}" if missing else ""))

    b = report["backend"]
    if "error" in b:
        warn(f"backend unreachable: {b['error']} (try --platform cpu to "
             f"debug host-side; check the TPU tunnel otherwise)")
    else:
        cold = (" (includes backend/tunnel cold-start — rerun for "
                "steady-state)" if b.get("probe_s", 0) > 10 else "")
        probe = (f", probe {b['probe_s']} s{cold}" if "probe_s" in b
                 else f", probe FAILED: {b['probe_error']}"
                 if "probe_error" in b else "")
        msg = (f"backend {b['platform']}: {b['device_count']} × "
               f"{'/'.join(b['device_kinds'])}{probe}")
        (warn if "probe_error" in b else ok)(msg)

    n = report["native_io"]
    if n["available"]:
        ok(f"native IO: {n['lib']}")
    else:
        warn("native IO unavailable (libdose_io.so failed to build/load; "
             f"g++ {'present' if n['toolchain_gxx'] else 'MISSING'}) — "
             "data feeds fall back to the numpy chain (slower, same results)")

    c = report["compile_cache"]
    if c["disabled"]:
        warn("compile cache disabled via DPT_NO_CACHE=1 — every fresh "
             "process pays cold XLA compiles (minutes per program)")
    else:
        state = (f"{c.get('entries', 0)} entries, {c.get('size_mb', 0)} MB"
                 if c["exists"] else "not created yet (first run creates it)")
        pending = ("" if c["seed_entries_present"] >= c["seed_entries_shipped"]
                   else " (rest copied in on the next train/eval run)")
        seeds = (f"; shipped seeds {c['seed_entries_present']}/"
                 f"{c['seed_entries_shipped']} present{pending}")
        ok(f"compile cache: {c['dir']} ({state}){seeds}")

    for section in ("serve_aot", "train_aot"):
        s = report[section]
        if s["disabled"]:
            warn(f"{section} disabled via DPT_NO_AOT=1 — falling back to "
                 f"cache/cold compile")
            continue
        if not s["artifacts"]:
            warn(f"{section}: no artifacts in {s['dir']} — first "
                 f"serve/train pays the cold compile; build with "
                 f"scripts/build_{'serve' if section == 'serve_aot' else 'train'}_aot.py")
            continue
        for stem, rec in sorted(s["artifacts"].items()):
            tag = f"{section}/{stem} ({rec['size_mb']} MB)"
            if rec["status"] != "ok":
                warn(f"{tag}: {rec['detail']} — rebuild with scripts/"
                     f"build_{'serve' if section == 'serve_aot' else 'train'}_aot.py")
            elif rec.get("quickstart_reachable") is False:
                warn(f"{tag}: provenance ok but matches no CLI quick-start "
                     f"spec (kind {rec.get('spec_kind', '?')}) — a bare "
                     f"`train` run would cold-compile instead of loading it")
            else:
                extra = (" — serves the CLI quick-start"
                         if rec.get("quickstart_reachable") else "")
                ok(f"{tag}: {rec['detail']}{extra}")

    if "data" in report:
        d = report["data"]
        if d["patients"] == 0:
            warn(f"data: pattern {d['pattern']!r} matches NO patient dirs "
                 f"(want e.g. '/data/train-pats/pt_*')")
        elif d["issues"]:
            warn(f"data: {d['patients']} patients; issues in the first "
                 f"checked: " + " | ".join(d["issues"]))
        else:
            ok(f"data: {d['patients']} patient dirs, first "
               f"{min(3, d['patients'])} have CT/dose/mask + structures")

    lines.append(f"doctor: {warns} warning(s)")
    return lines, warns


def run(args) -> int:
    import json

    platform = getattr(args, "platform", "auto")
    report = collect_report(data=getattr(args, "data", None),
                            probe=getattr(args, "probe", False),
                            probe_timeout=getattr(args, "probe_timeout", 600.0),
                            platform=None if platform == "auto" else platform)
    lines, warns = render(report)
    if getattr(args, "json", False):
        print(json.dumps(report, indent=2, default=str))
    else:
        print("\n".join(lines))
    return 1 if (warns and getattr(args, "strict", False)) else 0

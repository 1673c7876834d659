"""Benchmark: end-to-end 128³ cascade inference on one TPU chip.

The north-star metric (BASELINE.md): full-patient cascade — sliding-window
OAR-TranSeg over the CT (96³ ROI, sw_batch 8) → one-hot OARs → concat →
DOSE-PYFER dose map → masked ×70 post-process — p50 latency per patient.
Baseline target: 1.0 s/chip on v5e ⇒ vs_baseline = baseline_p50 / measured_p50
(higher is better).

Compile-time policy (VERDICT r3 #1): the serve graphs can cold-compile in
tens of minutes on XLA-TPU (BENCH_r03: 1336.9 s), so the repo SHIPS the
compiled serve programs two ways and bench loads the first that works:

1. AOT executables (``artifacts/serve_aot/*.pkl``, loaded through
   dose_prediction_tpu.infer.aot — the same loader the product serve path
   uses; no cache-key matching, loads in milliseconds; built by
   scripts/build_serve_aot.py);
2. persistent-compilation-cache entries (``artifacts/serve_cache/``) seeded
   into the live ``.jax_cache`` — measured: cache keys are stable across
   processes within a tunnel session but can rotate across sessions, which
   is why the AOT path exists;
3. plain jit compile as the final fallback.

The JSON line reports per-stage compile seconds, which path served each
stage, and the seed stats — warm and cold numbers can never be conflated.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_P50_S = 1.0  # north-star: <1 s per 128^3 patient per chip (BASELINE.md)
REPO = Path(__file__).resolve().parent
# DPT_CACHE_DIR override exists so the seeded-cold path is testable without
# touching the live cache (point it at an empty dir → only the shipped
# artifact entries are available).
CACHE_DIR = Path(os.environ.get("DPT_CACHE_DIR", REPO / ".jax_cache"))
# Last successful bench result, written on every good run. Included
# (clearly labeled) in the error record when the device is unreachable so a
# dead tunnel at bench time doesn't erase the round's measured numbers.
LAST_GOOD = REPO / "artifacts" / "last_bench.json"


def seed_cache() -> dict:
    """Copy shipped serve/train-program cache entries into the live compile
    cache (shared implementation: core/bootstrap.py — the same seeding the
    product CLI performs). Returns
    {"shipped": N, "seeded": copied, "already_present": skipped}."""
    from dose_prediction_tpu.core.bootstrap import seed_cache as _seed

    return _seed(CACHE_DIR)


def _device_watchdog(timeout_s: float = 900.0,
                     platform: str | None = None) -> None:
    """Fail FAST with a structured JSON line if the device never answers a
    trivial op (the axon tunnel has been observed to hang for hours — a hung
    bench run is worse than an honest error record). The probe runs in a
    SUBPROCESS: a hung tunnel client blocks inside a C call holding the GIL,
    so an in-process watchdog thread would never get scheduled.

    The timeout is generous (15 min): first tunnel contact in a fresh
    process has been observed to take minutes when the backend is cold, and
    a false 'unresponsive' record is worse than a slow start. Probe-process
    FAILURES (as opposed to hangs) are retried once — first-connection
    libtpu init errors are transient — and labeled distinctly so a backend
    init bug is not misread as a hung tunnel."""
    import subprocess

    # honor a config-level backend force (CLI --platform): env alone can't
    # reach the subprocess past the site hook, so re-apply it in-code
    force = (f"import jax; jax.config.update('jax_platforms', '{platform}'); "
             if platform else "")
    probe = [sys.executable, "-c",
             force + "import jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8)))))"]
    deadline = time.monotonic() + timeout_s
    reason = None
    for attempt in range(2):
        budget = deadline - time.monotonic()
        if budget <= 0:
            break
        try:
            subprocess.run(probe, check=True, capture_output=True,
                           timeout=budget)
            return
        except subprocess.TimeoutExpired:
            reason = (f"device unresponsive: trivial probe op did not "
                      f"complete in {budget:.0f}s")
            break  # a hang consumed the whole budget; no point retrying
        except subprocess.CalledProcessError as e:
            reason = ("device probe subprocess failed (not a hang): "
                      + e.stderr.decode(errors="replace")[-300:])
            if attempt == 0:
                time.sleep(5.0)  # transient libtpu init errors: retry once
    record = {
        "metric": "cascade_128_p50_latency", "value": None,
        "unit": "s/patient", "vs_baseline": 0.0,
        "error": reason or f"device probe exceeded {timeout_s:.0f}s budget",
    }
    try:
        record["last_good_run"] = json.loads(LAST_GOOD.read_text())
    except (OSError, ValueError):
        pass
    print(json.dumps(record))
    sys.stdout.flush()
    os._exit(2)


def main() -> None:
    cache_stats = seed_cache()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # propagate a CLI-level --platform force (jax.config survives in-process
    # but not into the probe subprocess)
    forced = jax.config.jax_platforms if jax.config.jax_platforms else None
    _device_watchdog(platform=forced)

    import jax.numpy as jnp

    from dose_prediction_tpu.infer.cascade import make_cascade_stages
    from dose_prediction_tpu.models import DosePyfer, TranSeg

    dtype = jnp.bfloat16
    seg = TranSeg(out_ch=8, dtype=dtype)          # full-size: 12-layer ViT-768
    dose = DosePyfer(dtype=dtype)                 # full-size: 8-layer ViT-768 cascade

    key = jax.random.PRNGKey(0)
    ct = jax.random.normal(key, (1, 128, 128, 128, 1), dtype)
    ptv = (jax.random.uniform(key, (1, 128, 128, 128, 1)) < 0.05).astype(dtype)
    mask = (jax.random.uniform(key, (1, 128, 128, 128, 1)) < 0.6).astype(dtype)

    seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(1), jnp.zeros((1, 96, 96, 96, 1), dtype))
    dose_vars = jax.jit(dose.init)(jax.random.PRNGKey(2), jnp.zeros((1, 128, 128, 128, 9), dtype))

    def sync(x):
        # On the axon remote backend block_until_ready returns before the
        # computation finishes; a scalar host read is the reliable barrier.
        return float(jnp.sum(x.astype(jnp.float32)))

    # sw_batch_size is a pure performance knob (the overlap blend is exact
    # for any batching); 8 puts all windows of the 128³ grid in one predictor
    # call: measured 425 -> 377 ms for the sweep vs sw=4.
    stage1, stage2 = make_cascade_stages(seg, dose, roi_size=(96, 96, 96),
                                         sw_batch_size=8)

    # per stage: shipped AOT executable first, else lower+compile (hits the
    # seeded persistent cache when the session's keys match) — compile_sN is
    # the wall time of whichever path ran, path recorded in `aot`.
    # infer.aot is the same loader the product serve path uses
    # (make_cascade_fn(aot=True) → CLI --serve-dtype bfloat16).
    from dose_prediction_tpu.infer import aot as A

    aot_used = {}

    def get_program(name, build_fn, example_args):
        c, seconds, used = A.get_program(name, build_fn, example_args)
        aot_used[name] = used
        return c, seconds

    c1, compile_s1 = get_program(
        "stage1", lambda: jax.jit(stage1).lower(seg_vars, ct, ptv).compile(),
        (seg_vars, ct, ptv))
    structures = c1(seg_vars, ct, ptv)
    c2, compile_s2 = get_program(
        "stage2",
        lambda: jax.jit(stage2).lower(dose_vars, structures, mask).compile(),
        (dose_vars, structures, mask))
    sync(c2(dose_vars, structures, mask))
    compile_s = compile_s1 + compile_s2

    def run(ct, ptv, mask):
        return c2(dose_vars, c1(seg_vars, ct, ptv), mask)

    n_iters = 10
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        sync(run(ct, ptv, mask))
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    p90 = float(np.percentile(times, 90))

    # multi-patient sweep throughput: 1-deep pipelined dispatch (patient i+1's
    # cascade queued before patient i's sync read — the serve-sweep mode)
    from dose_prediction_tpu.infer.pipeline import pipeline_map

    t0 = time.perf_counter()
    n_sweep = 10
    for _ in pipeline_map(lambda i: run(ct, ptv, mask), sync, range(n_sweep)):
        pass
    sweep_vps = n_sweep / (time.perf_counter() - t0)

    # dense fast path (extra, NOT the headline): one full-volume seg forward
    # via pos-embed grid adaptation instead of the 8-window sweep — the sweep
    # recomputes ~2.4× of the conv work at this geometry. Accuracy vs the
    # sliding path must be validated on real data before serving with it
    # (mechanism-level Dice gate: tests/test_dense_gate.py).
    seg_dense = TranSeg(out_ch=8, dtype=dtype, trained_grid=(6, 6, 6))
    stage1_d, _ = make_cascade_stages(seg_dense, dose, seg_mode="dense")
    c1d, compile_s_dense = get_program(
        "stage1_dense",
        lambda: jax.jit(stage1_d).lower(seg_vars, ct, ptv).compile(),
        (seg_vars, ct, ptv))
    sync(c2(dose_vars, c1d(seg_vars, ct, ptv), mask))
    dense_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(c2(dose_vars, c1d(seg_vars, ct, ptv), mask))
        dense_times.append(time.perf_counter() - t0)
    dense_p50 = float(np.percentile(dense_times, 50))

    result = {
        "metric": "cascade_128_p50_latency",
        "value": round(p50, 6),
        "unit": "s/patient",
        "vs_baseline": round(BASELINE_P50_S / p50, 3),
        "p90_s": round(p90, 6),
        "volumes_per_sec_per_chip": round(1.0 / p50, 3),
        "sweep_volumes_per_sec": round(sweep_vps, 3),
        "dense_fastpath_p50_s": round(dense_p50, 6),
        "compile_s": round(compile_s, 1),
        "compile_s_stage1": round(compile_s1, 1),
        "compile_s_stage2": round(compile_s2, 1),
        "compile_s_dense": round(compile_s_dense, 1),
        "aot": aot_used,
        # provenance of the shipped executables that served (or failed to
        # serve) this run: build date + jax version + chip per artifact
        "aot_artifacts": A.artifact_manifest(),
        "cache": cache_stats,
        "device": jax.devices()[0].device_kind,
    }
    try:
        LAST_GOOD.parent.mkdir(parents=True, exist_ok=True)
        LAST_GOOD.write_text(json.dumps(
            {**result, "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S")}))
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

"""Benchmark: end-to-end 128³ cascade inference on one TPU chip.

The north-star metric (BASELINE.md): full-patient cascade — sliding-window
OAR-TranSeg over the CT (96³ ROI, sw_batch 4) → one-hot OARs → concat →
DOSE-PYFER dose map → masked ×70 post-process — as one jit program, p50
latency per patient. Baseline target: 1.0 s/chip on v5e ⇒
vs_baseline = baseline_p50 / measured_p50 (higher is better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


BASELINE_P50_S = 1.0  # north-star: <1 s per 128^3 patient per chip (BASELINE.md)


def main() -> None:
    import jax

    # Persistent compilation cache: the cascade graph contains hundreds of
    # distinct 3D convs whose XLA-TPU compiles dominate cold-start (~40 min);
    # with the cache, recompiles are O(seconds).
    from pathlib import Path

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dose_prediction_tpu.infer.cascade import make_cascade_fn
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

    # sw_batch_size is a pure performance knob (the overlap blend is exact
    # for any batching); 8 puts all windows of the 128³ grid in one predictor
    # call: measured 425 -> 377 ms for the sweep vs sw=4.
    run = make_cascade_fn(seg, seg_vars, dose, dose_vars,
                          roi_size=(96, 96, 96), sw_batch_size=8)

    def sync(x):
        # On the axon remote backend block_until_ready returns before the
        # computation finishes; a scalar host read is the reliable barrier.
        return float(jnp.sum(x.astype(jnp.float32)))

    t0 = time.perf_counter()
    sync(run(ct, ptv, mask))
    compile_s = time.perf_counter() - t0

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
    # sliding path must be validated on real data before serving with it.
    seg_dense = TranSeg(out_ch=8, dtype=dtype, trained_grid=(6, 6, 6))
    run_dense = make_cascade_fn(seg_dense, seg_vars, dose, dose_vars,
                                seg_mode="dense")
    sync(run_dense(ct, ptv, mask))
    dense_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(run_dense(ct, ptv, mask))
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
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()

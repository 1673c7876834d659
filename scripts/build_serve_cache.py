"""Build the shipped serve-program compile-cache artifact (VERDICT r3 #1).

The 128³ cascade serve graphs cold-compile in tens of minutes on XLA-TPU
(BENCH_r03: 1336.9 s). This script compiles exactly the three serve programs
bench.py runs — stage1 (96³ sliding-window TranSeg sweep, sw_batch 8),
stage2 (DOSE-PYFER 128³ forward + post-process), and the dense-path stage1 —
with the persistent compilation cache pointed at ``artifacts/serve_cache/``.
The resulting directory contains ONLY those entries and is committed as a
build artifact; bench.py (and any serve deployment via the same shapes) seeds
its live cache from it, turning the cold start into a cache load.

The artifact is keyed by jax/libtpu version + HLO hash: rebuild after
upgrading the stack or changing the model graphs (a stale artifact is
harmless — the keys simply stop matching and compilation falls back to cold).

Run on the real TPU:  python scripts/build_serve_cache.py
(expect a full cold compile: ~25-45 min; progress is printed per stage).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
ART = REPO / "artifacts" / "serve_cache"


def main() -> None:
    ART.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ART))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dose_prediction_tpu.infer.cascade import make_cascade_stages
    from dose_prediction_tpu.models import DosePyfer, TranSeg

    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)

    dtype = jnp.bfloat16
    seg = TranSeg(out_ch=8, dtype=dtype)
    dose = DosePyfer(dtype=dtype)
    key = jax.random.PRNGKey(0)
    ct = jax.random.normal(key, (1, 128, 128, 128, 1), dtype)
    ptv = (jax.random.uniform(key, (1, 128, 128, 128, 1)) < 0.05).astype(dtype)
    mask = (jax.random.uniform(key, (1, 128, 128, 128, 1)) < 0.6).astype(dtype)
    seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, 96, 96, 96, 1), dtype))
    dose_vars = jax.jit(dose.init)(jax.random.PRNGKey(2),
                                   jnp.zeros((1, 128, 128, 128, 9), dtype))
    log("inputs + params ready")

    stage1, stage2 = make_cascade_stages(seg, dose, roi_size=(96, 96, 96),
                                         sw_batch_size=8)
    t = time.time()
    c1 = jax.jit(stage1).lower(seg_vars, ct, ptv).compile()
    log(f"stage1 (sw8 sweep) compiled in {time.time() - t:.1f}s")
    structures = c1(seg_vars, ct, ptv)
    t = time.time()
    c2 = jax.jit(stage2).lower(dose_vars, structures, mask).compile()
    log(f"stage2 (dose) compiled in {time.time() - t:.1f}s")
    out = c2(dose_vars, structures, mask)
    print("cascade checksum:", float(jnp.sum(out.astype(jnp.float32))), flush=True)

    seg_dense = TranSeg(out_ch=8, dtype=dtype, trained_grid=(6, 6, 6))
    stage1_d, _ = make_cascade_stages(seg_dense, dose, seg_mode="dense")
    t = time.time()
    c1d = jax.jit(stage1_d).lower(seg_vars, ct, ptv).compile()
    log(f"dense stage1 compiled in {time.time() - t:.1f}s")
    out = c2(dose_vars, c1d(seg_vars, ct, ptv), mask)
    print("dense checksum:", float(jnp.sum(out.astype(jnp.float32))), flush=True)

    entries = sorted(ART.glob("*-cache"))
    total_mb = sum(e.stat().st_size for e in entries) / 1e6
    log(f"artifact: {len(entries)} cache entries, {total_mb:.1f} MB in {ART}")


if __name__ == "__main__":
    main()

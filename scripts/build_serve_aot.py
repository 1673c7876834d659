"""Build the shipped AOT serve executables (VERDICT r3 #1, primary artifact).

Compiles the three serve programs bench.py runs — stage1 (96³ sliding-window
TranSeg sweep, sw_batch 8), stage2 (DOSE-PYFER 128³ + post-process) and the
dense-path stage1 — and serializes the COMPILED executables with
jax.experimental.serialize_executable into ``artifacts/serve_aot/*.pkl.gz``.

Unlike the persistent-compilation-cache entries (artifacts/serve_cache/,
scripts/build_serve_cache.py), loading these does no cache-key matching —
measured on this image the cache keys rotate across tunnel sessions while a
serialized executable deserializes and runs in milliseconds from any process.
bench.py tries the AOT artifact first, then the seeded cache, then compiles.

Rebuild after upgrading jax/libtpu or changing the serve graphs; a stale
artifact is harmless (deserialization or the guarded first call fails and
bench falls back to compiling).

Run on the real TPU:  python scripts/build_serve_aot.py
"""

from __future__ import annotations

import gzip
import pickle
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
AOT_DIR = REPO / "artifacts" / "serve_aot"


def main() -> None:
    AOT_DIR.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax.experimental import serialize_executable as se

    from dose_prediction_tpu.infer.cascade import make_cascade_stages
    from dose_prediction_tpu.models import DosePyfer, TranSeg

    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)

    # EXACTLY bench.py's models/shapes — the artifact must match its programs
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
    seg_dense = TranSeg(out_ch=8, dtype=dtype, trained_grid=(6, 6, 6))
    stage1_d, _ = make_cascade_stages(seg_dense, dose, seg_mode="dense")

    from dose_prediction_tpu.infer import aot as A

    def build(name, fn, args):
        t = time.time()
        compiled = jax.jit(fn).lower(*args).compile()
        log(f"{name} compiled in {time.time() - t:.1f}s")
        payload = se.serialize(compiled)
        # ship gzipped (~4:1) — the loader resolves .pkl or .pkl.gz; drop any
        # stale plain .pkl so it can't shadow the fresh build
        (AOT_DIR / f"{name}.pkl").unlink(missing_ok=True)
        out = AOT_DIR / f"{name}.pkl.gz"
        with gzip.open(out, "wb", compresslevel=4) as f:
            pickle.dump(payload, f)
        # provenance sidecar: versions/chip/build date, read back by the
        # loader's staleness hint and by bench.py's artifact manifest
        A.write_sidecar(out, extra={"shipped_config": A.SHIPPED})
        log(f"{name}: wrote {out.stat().st_size / 1e6:.1f} MB (+ sidecar)")
        return compiled

    c1 = build("stage1", stage1, (seg_vars, ct, ptv))
    structures = c1(seg_vars, ct, ptv)
    c2 = build("stage2", stage2, (dose_vars, structures, mask))
    out = c2(dose_vars, structures, mask)
    print("cascade checksum:", float(jnp.sum(out.astype(jnp.float32))), flush=True)
    c1d = build("stage1_dense", stage1_d, (seg_vars, ct, ptv))
    out = c2(dose_vars, c1d(seg_vars, ct, ptv), mask)
    print("dense checksum:", float(jnp.sum(out.astype(jnp.float32))), flush=True)


if __name__ == "__main__":
    main()

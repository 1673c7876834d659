"""Round-5 perf experiment (VERDICT r4 next-round #3): measure the
separable-k7 TranSeg decoder variant (nn/mdunet.py ConvBlockK.separable —
343→21 taps per k7 conv) on the REAL stage-1 sweep (8×96³ windows over a
128³ CT) and on the full cascade. Adoption bar: end-to-end p50 −≥15% vs the
dense reference-parity path; either way the outcome lands in PERFORMANCE.md.

Run on the real TPU:  python scripts/seg_separable_experiment.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dose_prediction_tpu.infer.cascade import make_cascade_stages
from dose_prediction_tpu.models import DosePyfer, TranSeg


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    dtype = jnp.bfloat16
    dose = DosePyfer(dtype=dtype)
    key = jax.random.PRNGKey(0)
    ct = jax.random.normal(key, (1, 128, 128, 128, 1), dtype)
    ptv = (jax.random.uniform(key, (1, 128, 128, 128, 1)) < 0.05).astype(dtype)
    mask = (jax.random.uniform(key, (1, 128, 128, 128, 1)) < 0.6).astype(dtype)

    # stage2 (dose) once — shared by both variants for the end-to-end number
    dose_vars = jax.jit(dose.init)(jax.random.PRNGKey(2),
                                   jnp.zeros((1, 128, 128, 128, 9), dtype))

    results = {}
    c2 = None
    for mode in ("dense", "separable"):
        seg = TranSeg(out_ch=8, dtype=dtype, k7_mode=mode)
        seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(1),
                                     jnp.zeros((1, 96, 96, 96, 1), dtype))
        stage1, stage2 = make_cascade_stages(seg, dose, roi_size=(96, 96, 96),
                                             sw_batch_size=8)
        fn = jax.jit(stage1)
        t0 = time.time()
        structures = fn(seg_vars, ct, ptv)
        sync(structures)
        compile_s = time.time() - t0
        if c2 is None:
            t0 = time.time()
            c2 = jax.jit(stage2).lower(dose_vars, structures, mask).compile()
            sync(c2(dose_vars, structures, mask))
            print(f"stage2 ready in {time.time() - t0:.0f}s", flush=True)
        sweep = []
        for _ in range(10):
            t0 = time.time()
            sync(fn(seg_vars, ct, ptv))
            sweep.append(time.time() - t0)
        e2e = []
        for _ in range(10):
            t0 = time.time()
            sync(c2(dose_vars, fn(seg_vars, ct, ptv), mask))
            e2e.append(time.time() - t0)
        results[mode] = (np.percentile(sweep, 50), np.percentile(e2e, 50))
        print(f"k7_mode={mode}: sweep p50 {results[mode][0]*1e3:.1f} ms, "
              f"cascade p50 {results[mode][1]*1e3:.1f} ms "
              f"(stage1 compile {compile_s:.0f}s)", flush=True)

    d, s = results["dense"][1], results["separable"][1]
    print(f"end-to-end cascade p50: dense {d*1e3:.1f} ms -> separable "
          f"{s*1e3:.1f} ms = {100 * (d - s) / d:+.1f}% "
          f"({'ADOPT-worthy (>=15%)' if (d - s) / d >= 0.15 else 'below the adoption bar'})",
          flush=True)


if __name__ == "__main__":
    main()

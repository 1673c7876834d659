"""Round-4 perf experiment (VERDICT r3 #7): attack the seg-sweep conv ceiling
from the model side by routing the decoder k3 convs through the Pallas direct
kernel (256-lane and tight-band variants) and measuring the REAL stage-1
sweep (8×96³ windows over a 128³ CT). Keep the routing default-on only if
p50 drops ≥15%; either way the measured outcome lands in PERFORMANCE.md."""

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

from dose_prediction_tpu.core.config import FLAGS
from dose_prediction_tpu.infer.cascade import make_cascade_stages
from dose_prediction_tpu.models import DosePyfer, TranSeg


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    dtype = jnp.bfloat16
    seg = TranSeg(out_ch=8, dtype=dtype)
    dose = DosePyfer(dtype=dtype)
    key = jax.random.PRNGKey(0)
    ct = jax.random.normal(key, (1, 128, 128, 128, 1), dtype)
    ptv = (jax.random.uniform(key, (1, 128, 128, 128, 1)) < 0.05).astype(dtype)
    seg_vars = jax.jit(seg.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, 96, 96, 96, 1), dtype))

    for mode in ("0", "1", "tight"):
        FLAGS.use_pallas_conv3d = mode
        stage1, _ = make_cascade_stages(seg, dose, roi_size=(96, 96, 96),
                                        sw_batch_size=8)
        fn = jax.jit(stage1)
        t0 = time.time()
        sync(fn(seg_vars, ct, ptv))
        compile_s = time.time() - t0
        times = []
        for _ in range(8):
            t0 = time.time()
            sync(fn(seg_vars, ct, ptv))
            times.append(time.time() - t0)
        print(f"pallas_conv={mode}: sweep p50 {np.percentile(times, 50)*1e3:.1f} ms "
              f"(p90 {np.percentile(times, 90)*1e3:.1f}), compile {compile_s:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()

"""Training-feed wall-clock benchmark on the live chip: float32 vs native
bfloat16 vs packed (bit-packed masks + on-device augmentation).

Measures what real training pays per step END TO END — host augment/pack +
H2D over the tunnel + device step — the bottleneck VERDICT r2 quantified at
~16 s/step wall vs a 233 ms device step for the f32 feed at 128³.

Usage:
    python scripts/feed_bench.py [--shape 128] [--steps 6] [--small]
        [--feeds float32 bfloat16 packed]

Prints one JSON line per feed: {"feed": ..., "s_per_step_wall": ...,
"payload_mb_per_step": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=128)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--patients", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--feeds", nargs="*",
                    default=["float32", "bfloat16", "packed"])
    args = ap.parse_args()

    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.packed import packed_batch_nbytes, packed_dose_batches
    from dose_prediction_tpu.data.pipeline import device_prefetch, dose_batches
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
    from dose_prediction_tpu.models import DosePyfer
    from dose_prediction_tpu.train import state as S
    from dose_prediction_tpu.train import steps as STEP

    root = Path(tempfile.mkdtemp(prefix="feed_bench_"))
    pattern = make_synthetic_dataset(root, n_patients=args.patients,
                                     shape=(args.shape,) * 3)
    ds = OpenKBPDataset(pattern)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    if args.small:
        model = DosePyfer(out_ch=1, list_ch_A=(-1, 4, 8, 16, 32, 64),
                          feature_size=4, hidden_size=48, mlp_dim=96,
                          num_layers=4, num_heads=2)
    else:
        model = DosePyfer()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jax.numpy.zeros((args.batch_size, args.shape, args.shape, args.shape, 9),
                        jax.numpy.float32))
    tx = S.make_optimizer(learning_rate=1e-4)

    results = {}
    for feed in args.feeds:
        step = STEP.make_pyfer_train_step(model, tx, packed=feed == "packed")
        state = S.create_train_state(
            jax.tree.map(jax.numpy.array, variables), tx)

        def batches(epoch):
            if feed == "packed":
                return packed_dose_batches(ds, batch_size=args.batch_size,
                                           seed=epoch)
            return dose_batches(ds, batch_size=args.batch_size, seed=epoch,
                                native_bf16=feed == "bfloat16")

        payload = (packed_batch_nbytes(next(iter(batches(0))))
                   if feed == "packed" else
                   sum(v.nbytes for v in next(iter(batches(0))).values()))

        # warmup epoch: pays compile (+ pack cache for 'packed')
        for batch in device_prefetch(batches(0)):
            state, loss = step(state, batch)
        _ = float(loss)   # sync

        n = 0
        t0 = time.perf_counter()
        epoch = 1
        while n < args.steps:
            for batch in device_prefetch(batches(epoch)):
                state, loss = step(state, batch)
                n += 1
                if n >= args.steps:
                    break
            epoch += 1
        _ = float(loss)   # ONE sync closes the timing (block_until_ready is a
                          # no-op on the axon tunnel)
        wall = (time.perf_counter() - t0) / n
        results[feed] = wall
        print(json.dumps({"feed": feed, "s_per_step_wall": round(wall, 3),
                          "payload_mb_per_step": round(payload / 2**20, 2)}),
              flush=True)

    if "float32" in results and "packed" in results:
        print(json.dumps({"speedup_packed_vs_f32":
                          round(results["float32"] / results["packed"], 2)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Device-batch ≥3 flagship training probe on the live chip.

Round-2 finding: the batch-3 128³ flagship train-step graph timed out in
remote compilation (500 s) and HBM headroom was unproven. Round-3 levers:
per-block remat in the net_B decoder (remat_blocks — the multi-scale stages
at full resolution are the activation whale) + frozen-net_A stop_gradient +
the packed feed (no f32 batch resident during H2D).

Usage:
    python scripts/batch3_train_tpu.py [--batch 3] [--steps 2] [--shape 128]
        [--no-remat]

Prints one JSON line: {"batch": N, "remat_blocks": ..., "ok": ...,
"s_per_step": ..., "compile_s": ...}.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--shape", type=int, default=128)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="use the float32 feed instead of packed (control for "
                         "compile-helper failures)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="micro-batch accumulation (optax.MultiSteps): each "
                         "device step stays at --batch, one optimizer update "
                         "per k steps — effective batch = k * batch. The "
                         "route to batch>=3 while the remote compile helper "
                         "rejects every device-batch>=2 graph.")
    args = ap.parse_args()

    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.packed import packed_dose_batches
    from dose_prediction_tpu.data.pipeline import dose_batches
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
    from dose_prediction_tpu.models import DosePyfer
    from dose_prediction_tpu.train import state as S
    from dose_prediction_tpu.train import steps as STEP

    remat = not args.no_remat
    print(f"device: {jax.devices()[0].device_kind}  batch={args.batch} "
          f"remat_blocks={remat}", flush=True)

    root = Path(tempfile.mkdtemp(prefix="batch3_"))
    pattern = make_synthetic_dataset(root, n_patients=args.batch,
                                     shape=(args.shape,) * 3)
    ds = OpenKBPDataset(pattern)

    model = DosePyfer(remat_blocks=remat)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jax.numpy.zeros((1, args.shape, args.shape, args.shape, 9),
                        jax.numpy.float32))
    tx = S.make_optimizer(
        learning_rate=1e-4,
        freeze_labels=S.cascade_freeze_labels(variables["params"]),
        grad_accum=args.grad_accum)
    state = S.create_train_state(variables, tx)
    step = STEP.make_pyfer_train_step(model, tx, freeze=True,
                                      packed=not args.f32)

    def epoch_batches(epoch):
        if args.f32:
            return dose_batches(ds, batch_size=args.batch, seed=epoch,
                                drop_last=True)
        return packed_dose_batches(ds, batch_size=args.batch, seed=epoch,
                                   drop_last=True)

    t0 = time.perf_counter()
    result = {"batch": args.batch, "remat_blocks": remat,
              "packed": not args.f32, "grad_accum": args.grad_accum,
              "effective_batch": args.batch * args.grad_accum, "ok": False}
    try:
        n = 0
        first_done = None
        for epoch in range(32):
            for batch in epoch_batches(epoch):
                state, loss = step(state, batch)
                if first_done is None:
                    result["first_step_plus_compile_s"] = round(
                        time.perf_counter() - t0, 1)
                    loss_v = float(loss)       # sync closes compile+step 1
                    first_done = time.perf_counter()
                n += 1
                if n > args.steps:
                    break
            if n > args.steps:
                break
        import math

        loss_v = float(loss)                   # sync closes steady steps
        result["ok"] = math.isfinite(loss_v)
        result["loss"] = round(loss_v, 4)
        result["s_per_step"] = round(
            (time.perf_counter() - first_done) / (n - 1), 3)
    except Exception as e:  # OOM / compile failure: record, don't crash
        result["error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(result), flush=True)
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

"""On-chip OAR-TranSeg TRAIN-step probe at the reference's 96³-crop shape.

The one graph that never got a successful cold compile through the axon
tunnel in round 4 (the tunnel died mid-round): the TranSeg training step —
DiceCE on 96³ pos/neg crops (train_light_transeg.py:193-198). This drives
the PRODUCT path (TranSegTrainer.fit on a synthetic cohort) for a few steps
and reports compile + steady-state step wall time.

Usage:  python scripts/seg_train_tpu.py [--batch 4] [--steps 4] [--crop 96]

Prints one JSON line: {"batch": N, "crop": ..., "ok": ..., "compile_s": ...,
"s_per_step": ...}.
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--feed-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--remat", action="store_true",
                    help="per-block decoder remat (TranSeg remat_blocks) — "
                         "batch 4 at 96³ OOMs by ~83 MB without it")
    ap.add_argument("--platform", default=None,
                    help="force a jax backend (e.g. 'cpu' for a dry run; "
                         "jax.config-level so it beats the site hook)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.pipeline import seg_batches
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
    from dose_prediction_tpu.models import TranSeg
    from dose_prediction_tpu.train.trainers import TrainConfig, TranSegTrainer

    rec = {"batch": args.batch, "crop": args.crop, "remat": args.remat,
           "ok": False}
    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp) / "data"
        pattern = make_synthetic_dataset(root, n_patients=2,
                                         shape=(128, 128, 128), seed=0)
        ds = OpenKBPDataset(pattern)
        cfg = TrainConfig(batch_size=args.batch, learning_rate=1e-4,
                          weight_decay=1e-5, ckpt_dir=str(Path(tmp) / "ckpt"),
                          log_dir=str(Path(tmp) / "logs"),
                          feed_dtype=args.feed_dtype,
                          remat_blocks=args.remat)
        trainer = TranSegTrainer(cfg, crop=(args.crop,) * 3)

        batches = seg_batches(ds, crop=(args.crop,) * 3, batch_size=args.batch,
                              seed=0, feed_dtype=args.feed_dtype)
        first = next(batches)
        dev_batch = {k: jax.device_put(v) for k, v in first.items()}

        t0 = time.time()
        state, loss = trainer.train_step(trainer.state, dev_batch)
        loss0 = float(loss)  # host read = the only real sync on this tunnel
        rec["compile_s"] = round(time.time() - t0, 1)
        rec["loss_first"] = round(loss0, 4)

        times = []
        for _ in range(args.steps):
            nxt = next(batches, None)
            if nxt is None:
                batches = seg_batches(ds, crop=(args.crop,) * 3,
                                      batch_size=args.batch, seed=1,
                                      feed_dtype=args.feed_dtype)
                nxt = next(batches)
            dev_batch = {k: jax.device_put(v) for k, v in nxt.items()}
            t0 = time.time()
            state, loss = trainer.train_step(state, dev_batch)
            lossN = float(loss)
            times.append(time.time() - t0)
        rec["loss_last"] = round(lossN, 4)
        rec["s_per_step"] = round(float(np.median(times)), 3)
        rec["s_per_step_all"] = [round(t, 3) for t in times]
        rec["ok"] = bool(np.isfinite(lossN))
        rec["device"] = jax.devices()[0].device_kind
    print(json.dumps(rec))
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

"""Real-data dress rehearsal: given ANY OpenKBP-format directory, run the
full product pipeline — seg training, dose training, evaluation, and linked
cascade inference — and emit the reference's metric dict as JSON.

This is the one-command path a user of the reference repo would follow
(train_light_transeg.main → train_light_pyfer.main →
train_light_linked_model test_step; SURVEY.md §3.1-3.3), exercising the RAM
cache + prefetch + jit train steps + sliding-window inference at scale.

Usage:
    python scripts/dress_rehearsal.py --data 'path/pt_*' [--out results.json]
        [--epochs-seg 2 --epochs-dose 2] [--size N] [--synthetic N [--shape 128]]

With --synthetic N it first generates an N-patient synthetic cohort (default
shape 128³) so the rehearsal runs in data-free environments; pass a real
OpenKBP glob via --data otherwise. Documented runtime: on the single live TPU
chip with the default 10-patient 128³ synthetic cohort and 2+2 epochs, the
whole rehearsal takes ~10-15 min wall (host feed dominated; the device steps
are ~0.3 s each; first run pays XLA compiles unless .jax_cache is warm).
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
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data", default=None, help="OpenKBP patient glob, e.g. 'data/pt_*'")
    ap.add_argument("--synthetic", type=int, default=None,
                    help="generate an N-patient synthetic cohort instead of --data")
    ap.add_argument("--shape", type=int, default=128, help="synthetic volume size")
    ap.add_argument("--size", type=int, default=None, help="limit #patients")
    ap.add_argument("--epochs-seg", type=int, default=2)
    ap.add_argument("--epochs-dose", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--out", default="dress_rehearsal_results.json")
    ap.add_argument("--workdir", default=None, help="ckpt/log root (default: tmp)")
    ap.add_argument("--small", action="store_true",
                    help="reduced model widths (CI-sized rehearsal)")
    ap.add_argument("--feed-dtype", choices=["float32", "bfloat16", "packed"],
                    default="float32",
                    help="training feed: 'packed' ships bit-packed masks and "
                         "augments on device (6x less H2D — data/packed.py)")
    ap.add_argument("--platform", choices=["auto", "cpu"], default="auto",
                    help="force the jax backend ('cpu' beats a site hook "
                         "that overrides JAX_PLATFORMS — lets the rehearsal "
                         "run on hosts whose TPU is unreachable)")
    args = ap.parse_args()

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)

    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.models import DosePyfer, TranSeg
    from dose_prediction_tpu.train.linked import LinkedModel
    from dose_prediction_tpu.train.trainers import (
        PyferTrainer,
        TrainConfig,
        TranSegTrainer,
    )

    if args.data is None and args.synthetic is None:
        ap.error("need --data or --synthetic N")
    pattern = args.data
    if pattern is None:
        from dose_prediction_tpu.data.synthetic import make_synthetic_dataset

        root = Path(tempfile.mkdtemp(prefix="rehearsal_openkbp_"))
        print(f"generating {args.synthetic} synthetic patients @{args.shape}^3 "
              f"in {root}", flush=True)
        pattern = make_synthetic_dataset(root, n_patients=args.synthetic,
                                         shape=(args.shape,) * 3)

    work = Path(args.workdir or tempfile.mkdtemp(prefix="rehearsal_work_"))
    print(f"workdir: {work}", flush=True)
    ds = OpenKBPDataset(pattern, size=args.size, keep_structures=True)
    shape = ds.patients[0].ct.shape
    print(f"dataset: {len(ds)} patients @ {shape}", flush=True)
    t_all = time.perf_counter()

    if args.small:
        seg_model = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                            num_layers=4, num_heads=2)
        dose_model = DosePyfer(out_ch=1, list_ch_A=(-1, 4, 8, 16, 32, 64),
                               feature_size=4, hidden_size=48, mlp_dim=96,
                               num_layers=8, num_heads=6)
        crop = tuple(min(32, s) for s in shape)
    else:
        seg_model, dose_model = TranSeg(), DosePyfer()
        crop = tuple(min(96, s) for s in shape)

    # ---- stage 1: OAR-TranSeg (train_light_transeg.main) -------------------
    t0 = time.perf_counter()
    seg_cfg = TrainConfig(max_epochs=args.epochs_seg, check_val=max(1, args.epochs_seg),
                          batch_size=args.batch_size, learning_rate=1e-4,
                          feed_dtype=args.feed_dtype,
                          ckpt_dir=str(work / "seg_ckpt"), log_dir=str(work / "seg_logs"))
    seg_tr = TranSegTrainer(seg_cfg, model=seg_model, crop=crop)
    seg_tr.fit(ds, val_ds=ds, num_samples=2)
    dice, hd95, seg_val_loss = seg_tr.validate(ds)
    seg_time = time.perf_counter() - t0
    print(f"[seg] {args.epochs_seg} epochs in {seg_time:.0f}s  "
          f"dice={dice:.4f} hd95={hd95:.2f} val_loss={seg_val_loss:.4f}", flush=True)

    # ---- stage 2: DOSE-PYFER (train_light_pyfer.main) -----------------------
    t0 = time.perf_counter()
    dose_cfg = TrainConfig(max_epochs=args.epochs_dose, check_val=max(1, args.epochs_dose),
                           batch_size=args.batch_size, feed_dtype=args.feed_dtype,
                           ckpt_dir=str(work / "dose_ckpt"), log_dir=str(work / "dose_logs"))
    dose_tr = PyferTrainer(dose_cfg, model=dose_model,
                           example_shape=(1, *shape, 9))
    dose_tr.fit(ds, val_ds=ds, resume=False)
    dose_time = time.perf_counter() - t0

    # ---- stage 3: OpenKBP scoring sweep (train_light_pyfer test_step) ------
    t0 = time.perf_counter()
    eval_results = dose_tr.test(ds)
    eval_time = time.perf_counter() - t0
    print(f"[dose] trained {dose_time:.0f}s; eval {eval_time:.0f}s  "
          f"dose_score={eval_results['mean_dose_score']:.3f} Gy  "
          f"dvh_score={eval_results['mean_dvh_score']:.3f}", flush=True)

    # ---- stage 4: linked cascade (train_light_linked_model test_step) ------
    t0 = time.perf_counter()
    linked = LinkedModel(
        seg_model=seg_model, dose_model=dose_model,
        seg_variables={"params": seg_tr.state.params,
                       "batch_stats": seg_tr.state.batch_stats},
        dose_variables={"params": dose_tr.state.params,
                        "batch_stats": dose_tr.state.batch_stats},
        roi_size=crop)
    linked_results = linked.evaluate(ds, with_ivs=False)
    linked_time = time.perf_counter() - t0
    print(f"[linked] cascade eval {linked_time:.0f}s  "
          f"dose_score={linked_results['mean_dose_score']:.3f} Gy", flush=True)

    # the reference's metric dict (evaluate_openKBP.py:149-222 keys)
    out = {
        "n_patients": len(ds),
        "volume_shape": list(shape),
        "seg": {"dice_metric": dice, "hd95_metric": hd95,
                "val_loss": seg_val_loss, "train_seconds": seg_time},
        "dose": {"mean_dose_score": eval_results["mean_dose_score"],
                 "std_dose_score": eval_results["std_dose_score"],
                 "mean_dvh_score": eval_results["mean_dvh_score"],
                 "train_seconds": dose_time, "eval_seconds": eval_time},
        "linked": {"mean_dose_score": linked_results["mean_dose_score"],
                   "mean_dvh_score": linked_results["mean_dvh_score"],
                   "eval_seconds": linked_time},
        "per_patient": eval_results["per_patient"],
        "total_seconds": time.perf_counter() - t_all,
    }
    Path(args.out).write_text(json.dumps(out, indent=2, default=float))
    print(f"wrote {args.out}  (total {out['total_seconds']:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Build shipped TRAIN-step AOT executables (VERDICT r4 #1).

The flagship and seg train graphs cold-compile in minutes on XLA-TPU
(docs/PERFORMANCE.md: ~7 min flagship, 329 s seg) and the persistent-cache
keys rotate across runtime sessions — so, like the serve path, the default
CLI train configurations ship as serialized executables:

- ``artifacts/train_aot/pyfer-<spec>.pkl``   — the exact train step a bare
  ``python -m dose_prediction_tpu train pyfer --data ...`` builds
  (full DOSE-PYFER, batch 1, frozen net_A, adam8bit, float32 feed), plus a
  ``--feed-dtype packed`` variant (the measured-fastest feed).
- ``artifacts/train_aot/transeg-<spec>.pkl`` — the default seg train step
  (96³ crops, batch 1×4 samples, adamw).

Each artifact gets a provenance sidecar (jax/libtpu/chip/build date + the
FULL graph-determining spec). The loader (infer/aot.py::load_train_aot)
refuses any artifact whose spec does not match exactly — train executables
bake in lr/wd/loss weights, so a near-match would silently train with wrong
hyperparameters. Trainers pick these up automatically via
maybe_wrap_train_step; a stale artifact degrades to jit with a hint.

The persistent compile cache is pointed at ``artifacts/train_cache`` during
the build, so the same programs are ALSO shipped as cache entries (the
layer-2 fallback the CLI seeds from — core/bootstrap.py).

Run on the real TPU:  python scripts/build_train_aot.py [--skip-packed]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# build must see the RAW jit steps (no self-wrapping from a previous build)
os.environ["DPT_NO_AOT"] = "1"

TRAIN_AOT = REPO / "artifacts" / "train_aot"
TRAIN_CACHE = REPO / "artifacts" / "train_cache"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-packed", action="store_true",
                    help="only build the bare-default (float32 feed) flagship "
                         "artifact")
    ns = ap.parse_args()

    TRAIN_AOT.mkdir(parents=True, exist_ok=True)
    TRAIN_CACHE.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", str(TRAIN_CACHE))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.experimental import serialize_executable as se

    from dose_prediction_tpu.cli.main import _DEFAULT_LR, resolve_optimizer
    from dose_prediction_tpu.data.openkbp import OpenKBPDataset
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset
    from dose_prediction_tpu.infer import aot as A
    from dose_prediction_tpu.train.trainers import (
        PyferTrainer,
        TrainConfig,
        TranSegTrainer,
        _train_batches,
    )
    from dose_prediction_tpu.data.pipeline import seg_batches

    t_start = time.time()

    def log(msg):
        print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)

    # a REAL 128³ feed batch so shapes/dtypes match the product exactly
    tmp = tempfile.mkdtemp(prefix="train_aot_fixture_")
    pattern = make_synthetic_dataset(Path(tmp), n_patients=1,
                                     shape=(128, 128, 128))
    ds = OpenKBPDataset(pattern)
    log("128³ synthetic fixture ready")

    def cli_default_cfg(model_name: str, feed_dtype: str) -> TrainConfig:
        # mirrors cli.main make_cfg() with no flags passed — the quick-start
        # configuration (spec mismatch is refused at load time, so drift is
        # safe, just wasteful)
        return TrainConfig(learning_rate=_DEFAULT_LR,
                           optimizer=resolve_optimizer(None, model_name),
                           feed_dtype=feed_dtype)

    import gzip

    import jax.numpy as jnp

    from dose_prediction_tpu.train.state import create_train_state

    def write_artifact(out, compiled, spec):
        payload = se.serialize(compiled)
        with gzip.open(out, "wb", compresslevel=4) as f:
            pickle.dump(payload, f)
        A.write_sidecar(out, spec=spec)
        log(f"{out.name}: wrote {out.stat().st_size / 1e6:.1f} MB (+ sidecar)")

    def roundtrip(out, spec, path_fn):
        # spec gate + deserialize; DPT_NO_AOT is set during the build, so
        # toggle it off around the loader call
        os.environ.pop("DPT_NO_AOT", None)
        prog = A.load_train_aot(spec, path_fn=path_fn)
        os.environ["DPT_NO_AOT"] = "1"
        if prog is None:
            raise SystemExit(f"{out.name}: roundtrip load failed")
        log(f"{out.name}: roundtrip load OK")

    def build(kind, trainer, example_shape, batch):
        spec = A.train_spec(kind, trainer.cfg, trainer.model, example_shape)
        # train executables are ~550 MB raw and gzip ~4:1 — ship compressed
        out = A.train_artifact_path(spec).with_suffix(".pkl.gz")
        t = time.time()
        compiled = trainer.train_step.lower(trainer.state, batch).compile()
        log(f"{out.name} compiled in {time.time() - t:.1f}s")
        write_artifact(out, compiled, spec)
        roundtrip(out, spec, A.train_artifact_path)

        # companion state-init executable: (PRNGKey,) -> TrainState, fusing
        # model.init + tx.init into ONE program (the trainer's fallback path
        # compiles the identical jit, so the persistent cache makes this
        # second .compile() cheap)
        init_fn = lambda k: create_train_state(
            trainer.model.init(k, jnp.zeros(example_shape, jnp.float32)),
            trainer.tx)
        t = time.time()
        compiled_init = jax.jit(init_fn).lower(
            jax.random.PRNGKey(trainer.cfg.seed)).compile()
        out_i = A.init_artifact_path(spec).with_suffix(".pkl.gz")
        log(f"{out_i.name} compiled in {time.time() - t:.1f}s")
        write_artifact(out_i, compiled_init, spec)
        roundtrip(out_i, spec, A.init_artifact_path)

    # 1) flagship, bare CLI defaults (float32 feed, adam8bit, frozen net_A).
    # Models come from the CLI's own factories so the spec key matches the
    # quick-start exactly (drift here = silently unreachable artifacts;
    # pinned by tests/test_bootstrap_aot.py shipped-spec test).
    from dose_prediction_tpu.cli.main import (
        default_flagship_model,
        default_seg_model,
    )

    feeds = ["float32"] if ns.skip_packed else ["float32", "packed"]
    for feed in feeds:
        cfg = cli_default_cfg("pyfer", feed)
        trainer = PyferTrainer(cfg, model=default_flagship_model(),
                               example_shape=(1, 128, 128, 128, 9))
        batch = next(iter(_train_batches(cfg, ds, 0, drop_last=False)))
        build("pyfer", trainer, (1, 128, 128, 128, 9), batch)

    # 2) seg, bare CLI defaults (96³ crops ×4, adamw, float32 feed)
    cfg = cli_default_cfg("transeg", "float32")
    trainer = TranSegTrainer(cfg, model=default_seg_model(),
                             crop=(96, 96, 96))
    batch = next(iter(seg_batches(ds, crop=(96, 96, 96), num_samples=4,
                                  batch_size=cfg.batch_size, seed=0)))
    build("transeg", trainer, (1, 96, 96, 96, 1), batch)

    entries = sorted(TRAIN_CACHE.glob("*-cache"))
    log(f"train_cache: {len(entries)} entries, "
        f"{sum(e.stat().st_size for e in entries) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()

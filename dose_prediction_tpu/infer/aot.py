"""Shipped ahead-of-time serve executables.

The three serve programs (96³ sliding sweep `stage1`, dense full-volume
`stage1_dense`, DOSE-PYFER `stage2`) cold-compile in minutes-to-tens-of-
minutes on XLA-TPU (docs/PERFORMANCE.md "killing the cold-compile cliff"),
so the repo ships them pre-compiled via jax.experimental.serialize_executable
(`artifacts/serve_aot/*.pkl`, built on the target hardware by
scripts/build_serve_aot.py). Unlike the persistent compilation cache there
is no cache-key matching — a serialized executable deserializes and runs in
milliseconds from any process on a compatible chip/runtime.

This module is the single loader used by bench.py AND the product serve
path (infer.cascade.make_cascade_fn(aot=True) → CLI `infer` / `linked-eval`
--serve-dtype bfloat16). A stale or mismatched artifact is harmless: the
deserialize or the first call raises and callers fall back to jit.

Environment knobs: ``DPT_NO_AOT=1`` disables loading entirely;
``DPT_AOT_DIR`` overrides the artifact directory.

Known quirk: a deserialized executable takes its device assignment from ALL
local devices, so on a multi-device backend a single-chip artifact loads but
is rejected at its first call ("expected N shards") — the guarded-call
fallback absorbs this (single-chip serve is the artifact's target; multi-chip
serve goes through infer.pipeline / the mesh-sharded sweep, which compile).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path
from typing import Optional

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / "artifacts" / "serve_aot"

# the configuration the shipped artifacts were built for
# (scripts/build_serve_aot.py: full-size models, bf16 activations/f32 params,
# 128³ volumes; stage1 = roi 96³ / sw_batch 8 / overlap 0.25 / 8 classes,
# stage1_dense = trained_grid (6,6,6))
SHIPPED = {
    "roi_size": (96, 96, 96),
    "sw_batch_size": 8,
    "overlap": 0.25,
    "num_oar_classes": 8,
    "dose_scale": 70.0,
}


def aot_dir() -> Path:
    return Path(os.environ.get("DPT_AOT_DIR", _DEFAULT_DIR))


def build_info(device_kind: Optional[str] = None) -> dict:
    """Versions + chip the CURRENT process would build artifacts against.
    Recorded in every artifact's sidecar at build time, and compared against
    at load time so a rejection can say exactly WHAT is stale.

    Pass ``device_kind`` to skip the in-process device query — jax.devices()
    BLOCKS (not raises) on a dead tunnel, so callers that already learned the
    chip kind out-of-process (cli/doctor.py's subprocess probe) must not
    touch the device again here."""
    import jax

    if device_kind is None:
        try:
            device_kind = jax.devices()[0].device_kind
        except Exception:
            device_kind = "unknown"
    libtpu = "none"
    try:
        import importlib.metadata as im

        for dist in ("libtpu", "libtpu-nightly"):
            try:
                libtpu = f"{dist} {im.version(dist)}"
                break
            except im.PackageNotFoundError:
                continue
    except Exception:
        pass
    import jaxlib

    return {"jax": jax.__version__, "jaxlib": jaxlib.__version__,
            "libtpu": libtpu, "device_kind": device_kind}


def _sidecar_path(pkl_path: Path) -> Path:
    """<name>.json next to <name>.pkl OR <name>.pkl.gz (artifacts over
    ~100 MB ship gzipped — serialized train executables compress ~4:1)."""
    pkl_path = Path(pkl_path)
    name = pkl_path.name
    for suffix in (".pkl.gz", ".pkl"):
        if name.endswith(suffix):
            return pkl_path.with_name(name[: -len(suffix)] + ".json")
    return pkl_path.with_suffix(".json")


def _read_payload(path: Path):
    import gzip
    import pickle

    opener = gzip.open if path.name.endswith(".gz") else open
    with opener(path, "rb") as f:
        return pickle.load(f)


def _find_artifact(base: Path) -> Optional[Path]:
    """Resolve <stem>.pkl or <stem>.pkl.gz (plain wins when both exist)."""
    if base.exists():
        return base
    gz = base.with_name(base.name + ".gz")
    return gz if gz.exists() else None


def write_sidecar(pkl_path: Path, *, spec: Optional[dict] = None,
                  extra: Optional[dict] = None) -> Path:
    """Provenance sidecar next to an artifact: versions/chip it was built
    for, build date, artifact size, and (for train artifacts) the full
    graph-determining spec. Build scripts call this after writing the .pkl."""
    import json
    import time

    pkl_path = Path(pkl_path)
    record = {
        "built": build_info(),
        "built_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "size_bytes": pkl_path.stat().st_size,
        "rebuild_with": ("scripts/build_train_aot.py" if spec
                         else "scripts/build_serve_aot.py"),
    }
    if spec is not None:
        record["spec"] = spec
    if extra:
        record.update(extra)
    out = _sidecar_path(pkl_path)
    out.write_text(json.dumps(record, indent=2, sort_keys=True, default=str))
    return out


def read_sidecar(pkl_path: Path) -> Optional[dict]:
    import json

    try:
        return json.loads(_sidecar_path(pkl_path).read_text())
    except (OSError, ValueError):
        return None


def artifact_manifest(directory: Optional[Path] = None) -> dict:
    """{name: sidecar-summary} for every artifact in a directory — bench.py
    embeds this in its JSON so a measurement records which artifact builds
    served it."""
    directory = aot_dir() if directory is None else Path(directory)
    out = {}
    # plain .pkl listed first and kept on stem collision — matching
    # _find_artifact's preference, so the manifest describes the artifact
    # that would actually serve
    for pkl in sorted(directory.glob("*.pkl")) + sorted(directory.glob("*.pkl.gz")):
        sc = read_sidecar(pkl) or {}
        stem = pkl.name[:-7] if pkl.name.endswith(".pkl.gz") else pkl.stem
        if stem in out:
            continue
        out[stem] = {"built_at": sc.get("built_at", "unknown"),
                     "jax": sc.get("built", {}).get("jax", "unknown"),
                     "device_kind": sc.get("built", {}).get("device_kind",
                                                            "unknown"),
                     "size_mb": round(pkl.stat().st_size / 1e6, 1)}
    return out


def _staleness_hint(name: str, path: Path) -> str:
    """One-line 'built for X, you're on Y' diagnosis from the sidecar, so a
    silent minutes-long fallback compile is at least explained."""
    sc = read_sidecar(path)
    if sc is None:
        return (f"no provenance sidecar for {path.name}; rebuild with "
                f"scripts/build_serve_aot.py to record one")
    built = sc.get("built", {})
    now = build_info()
    diffs = [f"{k}: built for {built.get(k, '?')}, running {now[k]}"
             for k in ("jax", "jaxlib", "libtpu", "device_kind")
             if built.get(k) != now[k]]
    what = "; ".join(diffs) if diffs else "versions match (graph drift?)"
    return (f"artifact built {sc.get('built_at', '?')} — {what}. Rebuild "
            f"with {sc.get('rebuild_with', 'scripts/build_serve_aot.py')}")


def load_aot(name: str):
    """Deserialize a shipped serve executable; None when absent, disabled, or
    incompatible with the running jax/libtpu (callers fall back to jit, and
    the sidecar-based staleness hint says why + how to rebuild)."""
    path = _find_artifact(aot_dir() / f"{name}.pkl")
    if path is None or os.environ.get("DPT_NO_AOT") == "1":
        return None
    try:
        from jax.experimental import serialize_executable as se

        return se.deserialize_and_load(*_read_payload(path))
    except Exception as e:  # stale jax/libtpu or foreign topology: recompile
        print(f"[aot] load failed for {name}: {type(e).__name__}: {e}\n"
              f"[aot] {_staleness_hint(name, path)}", file=sys.stderr)
        return None


def _force(out) -> None:
    """Synchronize on a program output. On the axon remote backend dispatch
    succeeds asynchronously and block_until_ready is a no-op, so a remote
    EXECUTION failure only surfaces at a host read — without this, a broken
    artifact would be accepted here and crash the caller at its first sync
    instead of falling back to jit."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def get_program(name: str, build_fn, example_args):
    """AOT-first program fetch with a guarded first call.

    Tries the shipped executable and validates it by actually calling it on
    ``example_args`` AND reading back a scalar (catches signature drift the
    deserializer can't see, and remote-execution failures that async dispatch
    hides); on any failure compiles via ``build_fn()``. Returns
    ``(program, seconds, used_aot)`` where seconds is the wall time of
    whichever path ran.
    """
    t0 = time.perf_counter()
    c = load_aot(name)
    used = c is not None
    if c is not None:
        try:
            _force(c(*example_args))
        except Exception as e:
            print(f"[aot] {name} rejected at call time: {e}", file=sys.stderr)
            used = False
            c = None
    if c is None:
        c = build_fn()
    return c, time.perf_counter() - t0, used


class LazyAOTStage:
    """A serve stage that tries the shipped executable on its first real call
    and silently falls back to (and stays on) the jit path on any failure.

    Used by make_cascade_fn(aot=True) where no example inputs exist at build
    time — the first patient's volume is the guarded call — and by the
    trainers for spec-checked train-step artifacts (``aot`` pre-loaded by
    load_train_aot, which refuses config mismatches before this point).
    """

    def __init__(self, name: str, jit_fn, aot=None):
        self.name = name
        self.jit_fn = jit_fn
        self._aot = load_aot(name) if aot is None else aot
        self.used_aot: Optional[bool] = None  # unknown until first call

    def __call__(self, *args):
        if self._aot is not None:
            try:
                out = self._aot(*args)
                if self.used_aot is None:
                    _force(out)  # first call: surface async remote failures
                self.used_aot = True
                return out
            except Exception as e:
                print(f"[aot] {self.name} rejected at call time "
                      f"({type(e).__name__}: {e}); falling back to jit",
                      file=sys.stderr)
                self._aot = None
                self._raise_if_inputs_donated(args, e)
        self.used_aot = False
        return self.jit_fn(*args)

    @staticmethod
    def _raise_if_inputs_donated(args, cause: Exception) -> None:
        """Train-step executables donate the state argument; if the shipped
        program failed AFTER dispatch (e.g. a runtime incompatibility surfaced
        by the first-call sync), the input buffers are already invalidated and
        the jit fallback would crash with a bare 'Array has been deleted'.
        Surface an actionable error instead."""
        import jax

        if any(getattr(leaf, "is_deleted", lambda: False)()
               for leaf in jax.tree_util.tree_leaves(args)):
            raise RuntimeError(
                "shipped AOT executable failed after donating its input "
                "buffers — the live training state was invalidated, so "
                "falling back to jit in-place is impossible. Re-run with "
                "DPT_NO_AOT=1 (resume picks up from the last checkpoint), "
                "and rebuild the artifacts with scripts/build_train_aot.py "
                "on this jax/libtpu.") from cause


# -- train-step AOT artifacts -------------------------------------------------
# A train-step executable bakes the loss weights, learning rate and weight
# decay into the graph as compile-time constants: a shape-compatible artifact
# built for a DIFFERENT config would load, pass the guarded call, and then
# silently train with the wrong hyperparameters. So train artifacts are keyed
# by a canonical spec of every graph-determining knob (model fields + loop
# config + batch geometry) and the loader refuses anything whose sidecar spec
# is not an exact match. Built by scripts/build_train_aot.py on the target
# hardware; DPT_TRAIN_AOT_DIR overrides the directory.

_DEFAULT_TRAIN_DIR = Path(__file__).resolve().parents[2] / "artifacts" / "train_aot"


def train_aot_dir() -> Path:
    return Path(os.environ.get("DPT_TRAIN_AOT_DIR", _DEFAULT_TRAIN_DIR))


def canonical_spec(spec: dict) -> str:
    """Deterministic JSON encoding used both for hashing and for the sidecar
    equality check (tuples/lists unify through JSON; dtypes via default=str)."""
    import json

    return json.dumps(spec, sort_keys=True, default=str,
                      separators=(",", ":"))


def spec_key(spec: dict) -> str:
    import hashlib

    return hashlib.sha256(canonical_spec(spec).encode()).hexdigest()[:12]


def model_spec(model) -> dict:
    """JSON-able dict of a flax module's constructor fields (flax modules are
    dataclasses) — every field shapes the traced graph."""
    import dataclasses

    out = {}
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name"):
            continue
        v = getattr(model, f.name)
        out[f.name] = v if isinstance(v, (int, float, bool, str, type(None))) \
            else (list(v) if isinstance(v, (tuple, list)) else str(v))
    return out


def train_spec(kind: str, cfg, model, example_shape) -> dict:
    """The full graph-determining configuration of a trainer's train step.
    cfg is a train.trainers.TrainConfig; fields that only drive the host loop
    (epochs, ckpt dirs, seeds, val cadence) are deliberately excluded."""
    return {
        "kind": kind,
        "model": type(model).__name__,
        "model_config": model_spec(model),
        "example_shape": list(example_shape),
        "batch_size": cfg.batch_size,
        "feed_dtype": cfg.feed_dtype,
        "optimizer": cfg.optimizer,
        "learning_rate": cfg.learning_rate,
        "weight_decay": cfg.weight_decay,
        "delta1": cfg.delta1,
        "delta2": cfg.delta2,
        "freeze_net_a": cfg.freeze_net_a,
        "grad_accum": cfg.grad_accum,
        "lr_encoder": cfg.lr_encoder,
        "lr_decoder": cfg.lr_decoder,
        "scheduler": cfg.scheduler,
    }


def train_artifact_path(spec: dict) -> Path:
    return train_aot_dir() / f"{spec['kind']}-{spec_key(spec)}.pkl"


def init_artifact_path(spec: dict) -> Path:
    """Companion state-init executable: (PRNGKey,) -> TrainState. One program
    fuses model.init + optimizer init (the eager tx.init would otherwise
    dispatch hundreds of small device ops), so a fresh process pays neither
    the minutes-long init compile nor the eager-op soup."""
    return train_aot_dir() / f"{spec['kind']}-{spec_key(spec)}-init.pkl"


def load_train_aot(spec: dict, *, path_fn=train_artifact_path):
    """Spec-checked train-step executable, or None. The sidecar must exist
    and its recorded spec must match EXACTLY (see module note above — this is
    a correctness gate, not just a compatibility one). Deserialization
    failures degrade with the staleness hint like the serve artifacts."""
    path = _find_artifact(path_fn(spec))
    if path is None or os.environ.get("DPT_NO_AOT") == "1":
        return None
    sc = read_sidecar(path)
    if sc is None or "spec" not in sc:
        print(f"[aot] {path.name}: no spec sidecar — refusing to use a train "
              f"artifact whose build config is unknown (it may bake in "
              f"different hyperparameters); rebuild with "
              f"scripts/build_train_aot.py", file=sys.stderr)
        return None
    if canonical_spec(sc["spec"]) != canonical_spec(spec):
        print(f"[aot] {path.name}: built for a different train config — "
              f"refusing (executables bake in lr/wd/loss weights). "
              f"Rebuild with scripts/build_train_aot.py", file=sys.stderr)
        return None
    try:
        from jax.experimental import serialize_executable as se

        return se.deserialize_and_load(*_read_payload(path))
    except Exception as e:
        print(f"[aot] train artifact load failed for {path.name}: "
              f"{type(e).__name__}: {e}\n"
              f"[aot] {_staleness_hint(path.stem, path)}", file=sys.stderr)
        return None


def maybe_wrap_train_step(kind: str, cfg, model, example_shape, jit_step):
    """Trainer hook: wrap a jit train step in a LazyAOTStage when a matching
    shipped executable exists. Single-device only (mesh runs compile); every
    mismatch path degrades to the jit step. Costs one stat() when no artifact
    matches — safe to call from every trainer construction (tests, HPO)."""
    if cfg.mesh_shape:
        return jit_step
    spec = train_spec(kind, cfg, model, example_shape)
    if _find_artifact(train_artifact_path(spec)) is None:
        return jit_step
    prog = load_train_aot(spec)
    if prog is None:
        return jit_step
    print(f"[aot] using shipped train-step executable "
          f"{train_artifact_path(spec).name}", file=sys.stderr)
    return LazyAOTStage(f"train:{kind}", jit_step, aot=prog)


def maybe_init_train_state(kind: str, cfg, model, example_shape, init_fn, key):
    """Trainer hook: build the initial TrainState from the shipped init
    executable when an exact spec match exists, else jit(init_fn)(key).
    ``init_fn(key) -> TrainState`` must fuse model.init + tx.init (that is
    what the shipped program was compiled from). Single-device only; any
    mismatch/failure degrades to the jit path."""
    import jax

    fallback = lambda: jax.jit(init_fn)(key)
    if cfg.mesh_shape or os.environ.get("DPT_NO_AOT") == "1":
        return fallback()
    spec = train_spec(kind, cfg, model, example_shape)
    if _find_artifact(init_artifact_path(spec)) is None:
        return fallback()
    prog = load_train_aot(spec, path_fn=init_artifact_path)
    if prog is None:
        return fallback()
    try:
        state = prog(key)
        print(f"[aot] state initialized from shipped executable "
              f"{init_artifact_path(spec).name}", file=sys.stderr)
        return state
    except Exception as e:  # wrong key layout / foreign topology
        print(f"[aot] init artifact rejected at call time: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        return fallback()

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


def load_aot(name: str):
    """Deserialize a shipped serve executable; None when absent, disabled, or
    incompatible with the running jax/libtpu (callers fall back to jit)."""
    import pickle

    path = aot_dir() / f"{name}.pkl"
    if not path.exists() or os.environ.get("DPT_NO_AOT") == "1":
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            payload = pickle.load(f)
        return se.deserialize_and_load(*payload)
    except Exception as e:  # stale jax/libtpu or foreign topology: recompile
        print(f"[aot] load failed for {name}: {type(e).__name__}: {e}",
              file=sys.stderr)
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
    time — the first patient's volume is the guarded call.
    """

    def __init__(self, name: str, jit_fn):
        self.name = name
        self.jit_fn = jit_fn
        self._aot = load_aot(name)
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
        self.used_aot = False
        return self.jit_fn(*args)

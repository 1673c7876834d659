"""Profiling hooks (SURVEY.md §5.1 upgrade path: replace the reference's
wall-clock-only TrainerTime with jax.profiler traces + per-step timing)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is None (or tracing is
    unsupported on the backend — e.g. remote tunnels). Only the profiler
    start/stop are guarded — exceptions raised by the profiled BODY propagate
    unchanged (wrapping the whole with-block would swallow them and surface
    as contextlib's \"generator didn't stop after throw()\")."""
    if log_dir is None:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass  # backends without profiler support still run the body
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def step_annotation(name: str) -> Iterator[None]:
    """Named sub-span inside a trace (shows up in TensorBoard/XProf).

    Only the ANNOTATION setup may be swallowed — an exception raised in the
    caller's body must propagate untouched (a catch around the yield would
    make contextlib see a second yield and replace the real error with
    "generator didn't stop after throw()")."""
    try:
        ann = jax.profiler.StepTraceAnnotation(name)
        ann.__enter__()
    except Exception:
        ann = None  # backends without profiler support still run the body
    try:
        yield
    finally:
        if ann is not None:
            try:
                ann.__exit__(None, None, None)
            except Exception:
                pass


class StepTimer:
    """Per-step host timing with device synchronization.

    On remote backends block_until_ready can return early; a scalar host read
    is used as the barrier (see tests/verify notes). Collects p50/p90."""

    def __init__(self):
        self.samples: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            leaves = jax.tree.leaves(result)
            if leaves:
                import jax.numpy as jnp

                float(jnp.sum(leaves[0].astype(jnp.float32)))
        self.samples.append(time.perf_counter() - (self._t0 or time.perf_counter()))

    def summary(self) -> dict:
        if not self.samples:
            return {}
        return {
            "p50_s": float(np.percentile(self.samples, 50)),
            "p90_s": float(np.percentile(self.samples, 90)),
            "mean_s": float(np.mean(self.samples)),
            "n": len(self.samples),
        }

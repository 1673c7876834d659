"""Metric logging + per-epoch timing report.

Replaces the reference's two observability paths (SURVEY.md §5.5):
- MLflow-to-databricks metric streams (train_light_pyfer.py:316-326) → a
  local metrics.jsonl with the same metric keys (any tracking backend can
  tail it; zero-egress environments stay functional);
- NetworkTrainer's log.txt per-epoch report with timers
  (network_trainer.py:288-338) → EpochTimer + console/file mirror.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Dict, Optional, TextIO


class MetricLogger:
    """Append-only JSONL metric log, mirrored to stdout."""

    def __init__(self, directory: str | Path, *, run_name: str = "run",
                 mirror_stdout: bool = True):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        # multi-host runs share log_dir (pod filesystems): non-zero processes
        # write a suffixed file so records never interleave in metrics.jsonl
        suffix = ""
        try:
            import jax

            if jax.process_count() > 1 and jax.process_index() != 0:
                suffix = f".p{jax.process_index()}"
        except Exception:
            pass
        self.path = self.dir / f"metrics{suffix}.jsonl"
        self._f: TextIO = open(self.path, "a")
        self.run_name = run_name
        self.mirror = mirror_stdout

    def log(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"step": int(step), "time": time.time(), "run": self.run_name}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.mirror:
            kv = " ".join(f"{k}={float(v):.6g}" for k, v in metrics.items())
            print(f"[{self.run_name} step {step}] {kv}", file=sys.stdout, flush=True)

    def log_text(self, text: str) -> None:
        with open(self.dir / "log.txt", "a") as f:
            f.write(text.rstrip() + "\n")
        if self.mirror:
            print(text, flush=True)

    def close(self) -> None:
        self._f.close()


class EpochTimer:
    """Accumulates train / data-loading / val wall time per epoch
    (TrainerTime parity, network_trainer.py:73-83)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.train_s = 0.0
        self.loader_s = 0.0
        self.val_s = 0.0
        self._t0: Optional[float] = None

    def tick(self):
        self._t0 = time.perf_counter()

    def tock(self, bucket: str):
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        setattr(self, bucket + "_s", getattr(self, bucket + "_s") + dt)
        self._t0 = None

    def report(self) -> str:
        return (f"train {self.train_s:.1f}s (loader {self.loader_s:.1f}s), "
                f"val {self.val_s:.1f}s")

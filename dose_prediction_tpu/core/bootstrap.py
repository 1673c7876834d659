"""Process-level compile-time bootstrap shared by every entry point.

The model graphs contain hundreds of distinct 3D convolutions; XLA-TPU cold
compiles are minutes per program (docs/PERFORMANCE.md "killing the
cold-compile cliff": 329 s for the seg train graph, ~7 min for the flagship
forward). The mitigation stack, in fallback order:

1. shipped AOT executables (``artifacts/serve_aot``, ``artifacts/train_aot``
   — loaded by infer.aot, no cache-key matching);
2. the persistent XLA compilation cache (``.jax_cache/``), pre-seeded here
   from the shipped ``artifacts/*_cache`` entries (keys are stable within a
   runtime session but can rotate across sessions, which is why the AOT
   layer exists);
3. plain cold compile.

bench.py and the scripts always configured layer 2; this module makes the
PRODUCT entry points (``python -m dose_prediction_tpu train/eval/...``) do
the same — the reference workflow restarts training repeatedly
(train_light_pyfer.py:343-347 resumes from last.ckpt), and without the cache
every restart would pay the full cold compile.

Environment knobs:
- ``DPT_NO_CACHE=1``  — leave the jax compilation-cache config untouched.
- ``DPT_CACHE_DIR``   — live cache directory (default ``<repo>/.jax_cache``).
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Dict, Optional

_REPO = Path(__file__).resolve().parents[2]
DEFAULT_CACHE_DIR = _REPO / ".jax_cache"
# shipped persistent-cache entries (build scripts: build_serve_cache.py,
# build_train_aot.py); missing directories are simply skipped
SEED_DIRS = (
    _REPO / "artifacts" / "serve_cache",
    _REPO / "artifacts" / "train_cache",
)


def cache_dir() -> Path:
    return Path(os.environ.get("DPT_CACHE_DIR", DEFAULT_CACHE_DIR))


def seed_cache(target: Optional[Path] = None) -> Dict[str, int]:
    """Copy shipped serve/train-program cache entries into the live compile
    cache. Returns {"shipped": N, "seeded": copied, "already_present": skipped}.
    """
    stats = {"shipped": 0, "seeded": 0, "already_present": 0}
    target = cache_dir() if target is None else Path(target)
    seed_dirs = [d for d in SEED_DIRS if d.is_dir()]
    if not seed_dirs:
        return stats
    target.mkdir(parents=True, exist_ok=True)
    for seed_dir in seed_dirs:
        for src in seed_dir.glob("*-cache"):
            stats["shipped"] += 1
            dst = target / src.name
            if dst.exists():
                stats["already_present"] += 1
            else:
                # atomic publish: N pod processes (or two concurrent CLI
                # invocations) may seed the same entry at once, and XLA may
                # read it mid-copy — write to a per-process temp name and
                # os.replace (the same pattern jax's own cache uses)
                tmp = target / f".{src.name}.{os.getpid()}.tmp"
                shutil.copyfile(src, tmp)
                os.replace(tmp, dst)
                stats["seeded"] += 1
    return stats


def configure_compile_cache() -> Optional[Dict[str, int]]:
    """Enable the persistent XLA compilation cache and seed it from the
    shipped artifacts. Idempotent; must run before the first compilation
    (config changes don't apply retroactively). Returns the seed stats, or
    None when disabled via ``DPT_NO_CACHE=1``."""
    if os.environ.get("DPT_NO_CACHE") == "1":
        return None
    stats = seed_cache()
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir()))
    # the default threshold skips small programs; our graphs that matter all
    # cost >> 1 s, and caching the small ones too costs nothing
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return stats

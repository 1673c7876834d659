"""Checkpointing + cross-model weight surgery (orbax-backed).

Replaces the reference's two mechanisms (SURVEY.md §5.4):
- pickle checkpoints of network/optimizer/scheduler/log
  (NetworkTrainer.save_trainer, network_trainer.py:340-357);
- Lightning ModelCheckpoint last/best files.

And the *partial restore* behaviors that the cascade workflow depends on:
- load a pretrained C3D net_A into DOSE-PYFER, keeping only keys that exist
  in the target and only the net_A/conv_out_A subtrees
  (create_pretrained_unet, dose_pyfer.py:363-407, c3d.py:200-203);
- prefix-strip + shape-match filtering for seg checkpoints
  (train_light_transeg.py:126-146).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


# in-flight async 'last'-slot writers by path (same-process synchronization
# across CheckpointManager instances; cross-process safety comes from orbax's
# tmp-dir + atomic rename). Values are weakrefs: fit() drains its writes on
# exit (_drains_checkpoints), so a collected manager has nothing in flight —
# and strong refs here would pin every per-trial manager for the process
# lifetime during long HPO sweeps.
import weakref

_LAST_INFLIGHT: Dict[str, "weakref.ref"] = {}

# one process-wide atexit drain over live managers (a per-instance
# atexit.register would pin each manager + its orbax threads forever)
_LIVE_MANAGERS: "weakref.WeakSet" = weakref.WeakSet()
_ATEXIT_REGISTERED = False


def _drain_all_managers() -> None:
    for mgr in list(_LIVE_MANAGERS):
        mgr._drain()


# ---------------------------------------------------------------------------
# orbax save / restore
# ---------------------------------------------------------------------------

def save_checkpoint(path: str | Path, tree: Any, *, force: bool = True) -> None:
    """Save an arbitrary pytree (train state, params, metrics) to ``path``."""
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore_checkpoint(path: str | Path, target: Optional[Any] = None) -> Any:
    """Restore a pytree; with ``target`` the result matches its structure,
    dtypes and shardings."""
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=target))


def variables_from_checkpoint(tree: Any) -> Any:
    """Normalize a restored checkpoint tree into flax ``variables``
    ({'params', 'batch_stats'}) regardless of how it was saved: raw variables,
    a bare params tree, a trainer slot ({'state': TrainState, 'epoch'}), or a
    GAN slot ({'g', 'd', 'epoch'} — the generator is taken). Mirrors the
    reference's tolerance for loading Lightning ckpts into bare modules
    (train_light_linked_model.py:79-97)."""
    if not isinstance(tree, dict):
        return tree
    if "state" in tree and isinstance(tree["state"], dict):
        tree = tree["state"]
    elif "g" in tree and isinstance(tree["g"], dict):
        tree = tree["g"]
    if "params" in tree:
        return {"params": tree["params"],
                "batch_stats": tree.get("batch_stats") or {}}
    return {"params": tree, "batch_stats": {}}


class CheckpointManager:
    """latest/best-k rotation (ModelCheckpoint(save_last, monitor) parity,
    train_light_pyfer.py:307-312).

    Layout: ``<dir>/monitored/<step>/`` for the metric-ranked saves and
    ``<dir>/last/`` for the every-epoch crash-resume slot (atomic overwrite).
    """

    def __init__(self, directory: str | Path, *, max_to_keep: int = 3,
                 monitor: str = "dose_score", mode: str = "max"):
        directory = Path(directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        self._dir = directory
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m[monitor],
            best_mode=mode,
        )
        self._mgr = ocp.CheckpointManager(directory / "monitored", options=options)
        self._last_ckptr: Optional[ocp.AsyncCheckpointer] = None
        # drain in-flight async writes before interpreter teardown — orbax's
        # background commit threads cannot schedule futures once the default
        # executor shuts down. ONE process-wide hook over a WeakSet: managers
        # stay collectable (HPO sweeps create one per trial).
        global _ATEXIT_REGISTERED
        _LIVE_MANAGERS.add(self)
        if not _ATEXIT_REGISTERED:
            import atexit

            atexit.register(_drain_all_managers)
            _ATEXIT_REGISTERED = True

    def save(self, step: int, tree: Any, metrics: Dict[str, float]) -> None:
        """Monitored save. Async: the write proceeds while training continues
        (orbax serializes device arrays to host first, so the tree can keep
        mutating); readers (restore_*/close) synchronize."""
        self._mgr.save(step, args=ocp.args.PyTreeSave(tree), metrics=metrics)

    # -- crash-resume slot (save_last=True / NetworkTrainer 'latest' parity:
    #    train_light_pyfer.py:307-312, network_trainer.py:305-313) ----------
    def save_last(self, tree: Any) -> None:
        """Overwrite the single rotating 'last' slot. Async with depth 1: the
        previous epoch's write finishes (tmp-dir + atomic rename) while this
        epoch trains — the save latency leaves the critical path. The
        device→host copy happens inside save() (orbax async contract), so the
        caller may keep donating/mutating the state.

        Contract: callers must reach wait()/close() (trainer fits do, via
        @_drains_checkpoints) before dropping the manager — the cross-instance
        in-flight registry holds weakrefs (strong refs would pin one thread
        pool per checkpoint dir across an HPO sweep), so an abandoned
        in-flight write is only guaranteed durable by orbax's atomic rename,
        not synchronized with."""
        self.save_named("last", tree)

    def save_named(self, name: str, tree: Any) -> None:
        """Overwrite the named rotating slot ``<dir>/<name>/`` (same async
        depth-1 contract as save_last; named slots share one checkpointer so
        at most one named write is in flight per manager). Used for 'last'
        and the legacy NetworkTrainer 'best_train_loss' slot
        (network_trainer.py:173-175)."""
        if self._last_ckptr is None:
            self._last_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        self._last_ckptr.wait_until_finished()   # at most one in flight
        self._last_ckptr.save(self._dir / name, args=ocp.args.PyTreeSave(tree),
                              force=True)
        # same-process readers (even via a different manager instance) must be
        # able to synchronize with this write
        _LAST_INFLIGHT[str(self._dir / name)] = weakref.ref(self._last_ckptr)

    def restore_named(self, name: str, target: Optional[Any] = None) -> Any:
        path = self._dir / name
        inflight_ref = _LAST_INFLIGHT.get(str(path))
        inflight = inflight_ref() if inflight_ref is not None else None
        if inflight is not None:
            inflight.wait_until_finished()
        if not path.exists():
            return None
        return restore_checkpoint(path, target)

    def restore_last(self, target: Optional[Any] = None) -> Any:
        return self.restore_named("last", target)

    # -- archival snapshots (NetworkTrainer 'iter_<iter>' slots saved every
    #    save_per_epoch epochs, network_trainer.py:304-307) -----------------
    def save_snapshot(self, step: int, tree: Any) -> None:
        """Write the never-rotated ``<dir>/iter_<step>/`` archival slot.
        Shares the named-slot machinery (async depth 1, cross-instance
        in-flight registration) so concurrent same-process readers
        synchronize with it exactly like with 'last'."""
        self.save_named(f"iter_{step}", tree)

    def snapshots(self) -> list:
        """Global steps of the archival iter_* slots, ascending. Waits for
        any in-flight same-process snapshot write first (the registry covers
        writes issued by OTHER manager instances too)."""
        prefix = str(self._dir / "iter_")
        for path, ref in list(_LAST_INFLIGHT.items()):
            if path.startswith(prefix):
                inflight = ref()
                if inflight is not None:
                    inflight.wait_until_finished()
        out = []
        for child in self._dir.iterdir() if self._dir.exists() else []:
            if child.is_dir() and child.name.startswith("iter_") \
                    and child.name[5:].isdigit():
                out.append(int(child.name[5:]))
        return sorted(out)

    def restore_snapshot(self, step: int, target: Optional[Any] = None) -> Any:
        return self.restore_named(f"iter_{step}", target)

    # -- run-config sidecar: graph-determining settings recorded next to the
    #    slots so a resume can detect a silently-incompatible relaunch (e.g.
    #    the CLI's pyfer optimizer default flipping adamw→adam8bit, or an act
    #    default change — params restore cleanly but the run would train with
    #    the wrong graph). Checked by train.trainers._try_resume. -----------
    def write_run_config(self, spec: dict) -> None:
        """Atomically record the run's graph-determining settings
        (``<dir>/run_config.json``). Overwritten at every fit start — after
        the resume guard has already compared against the previous record."""
        import json

        tmp = self._dir / ".run_config.json.tmp"
        tmp.write_text(json.dumps(spec, indent=2, sort_keys=True, default=str))
        os.replace(tmp, self._dir / "run_config.json")

    def read_run_config(self) -> Optional[dict]:
        """The previously recorded run config, or None (pre-sidecar runs)."""
        import json

        try:
            return json.loads((self._dir / "run_config.json").read_text())
        except (OSError, ValueError):
            return None

    def wait(self) -> None:
        """Block until every async save issued by this manager is durable."""
        if self._last_ckptr is not None:
            self._last_ckptr.wait_until_finished()
        self._mgr.wait_until_finished()

    def _drain(self) -> None:
        try:
            self.wait()
        except Exception:
            pass

    def _legacy_steps(self) -> list:
        """Numeric step dirs written by the pre-round-2 layout (<dir>/<step>/
        directly, before monitored/ was introduced). Without this fallback a
        resume against an old run silently restarts from scratch."""
        out = []
        for child in self._dir.iterdir() if self._dir.exists() else []:
            if child.is_dir() and child.name.isdigit():
                out.append(int(child.name))
        return sorted(out)

    def restore_latest(self, target: Optional[Any] = None) -> Tuple[Optional[int], Any]:
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step()
        if step is None:
            legacy = self._legacy_steps()
            if legacy:
                step = legacy[-1]
                print(f"[checkpoint] restoring legacy-layout step {step} from "
                      f"{self._dir} (pre-monitored/ checkpoint layout)")
                return step, restore_checkpoint(self._dir / str(step), target)
            return None, None
        args = ocp.args.PyTreeRestore(item=target) if target is not None else None
        return step, self._mgr.restore(step, args=args)

    def restore_best(self, target: Optional[Any] = None) -> Tuple[Optional[int], Any]:
        self._mgr.wait_until_finished()
        step = self._mgr.best_step()
        if step is None:
            return None, None
        args = ocp.args.PyTreeRestore(item=target) if target is not None else None
        return step, self._mgr.restore(step, args=args)

    def close(self):
        if self._last_ckptr is not None:
            self._last_ckptr.close()
            self._last_ckptr = None
        self._mgr.close()
        _LIVE_MANAGERS.discard(self)


# ---------------------------------------------------------------------------
# weight surgery
# ---------------------------------------------------------------------------

def flatten_params(tree: Any) -> Dict[Tuple[str, ...], Any]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        out[tuple(getattr(p, "key", str(p)) for p in path)] = leaf
    return out


def merge_partial(
    target: Any,
    source: Any,
    *,
    keep_if: Optional[Callable[[Tuple[str, ...]], bool]] = None,
    require_shape_match: bool = True,
    verbose: bool = True,
) -> Tuple[Any, Dict[str, int]]:
    """strict=False partial restore: copy every source leaf whose path exists
    in the target (optionally filtered by ``keep_if`` and by shape equality),
    leaving the rest of the target untouched.

    Returns (merged_tree, stats) where stats reports missing/inside/unused
    counts — the same bookkeeping the reference prints
    (dose_pyfer.py:396-401)."""
    tgt_flat = flatten_params(target)
    src_flat = flatten_params(source)

    inside = [k for k in src_flat if k in tgt_flat]
    unused = [k for k in src_flat if k not in tgt_flat]
    missing = [k for k in tgt_flat if k not in src_flat]

    merged = dict(tgt_flat)
    copied = 0
    for k in inside:
        if keep_if is not None and not keep_if(k):
            continue
        if require_shape_match and tuple(np.shape(src_flat[k])) != tuple(np.shape(tgt_flat[k])):
            continue
        merged[k] = src_flat[k]
        copied += 1

    stats = {"missing": len(missing), "inside": len(inside),
             "unused": len(unused), "copied": copied}
    if verbose:
        print(f"[surgery] missing={stats['missing']} inside={stats['inside']} "
              f"unused={stats['unused']} copied={stats['copied']}")

    treedef = jax.tree_util.tree_structure(target)
    leaves_by_path = merged
    ordered = [leaves_by_path[k] for k in flatten_params(target).keys()]
    return jax.tree_util.tree_unflatten(treedef, ordered), stats


def load_pretrained_net_a(cascade_params: Any, c3d_params: Any,
                          *, verbose: bool = True) -> Tuple[Any, Dict[str, int]]:
    """create_pretrained_unet semantics (c3d.py:200-203 filter →
    dose_pyfer.py:405-406 strict=False load): copy only net_A / conv_out_A
    subtrees from a trained C3D cascade into a target cascade."""
    return merge_partial(
        cascade_params,
        c3d_params,
        keep_if=lambda keys: any(k in ("net_A", "conv_out_A") for k in keys),
        verbose=verbose,
    )


def strip_prefix(tree: Any, prefix: str) -> Any:
    """Checkpoint-key prefix strip (train_light_transeg.py:130: '_model.' →
    ''): drop a leading path component when present."""
    flat = flatten_params(tree)
    out: Dict[Tuple[str, ...], Any] = {}
    for path, leaf in flat.items():
        if path and path[0] == prefix:
            path = path[1:]
        out[path] = leaf
    # rebuild nested dict
    nested: Dict = {}
    for path, leaf in out.items():
        node = nested
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = leaf
    return nested

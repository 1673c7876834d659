"""On-device sliding-window inference engine.

The reference calls MONAI's host-driven sliding_window_inference (96³ ROI,
sw_batch 4, overlap 0.25, constant blending; train_light_transeg.py:209-211,
train_light_linked_model.py:152-154). Here the whole sweep is ONE jit program:

- the window grid is computed at trace time (static shapes, MONAI dense-grid
  spacing: interval = roi·(1−overlap), last window clamped flush to the edge);
- windows are gathered with lax.dynamic_slice, batched on the sw axis, pushed
  through the predictor, and blended back with read-modify-write
  dynamic_update_slice adds inside a lax.scan — no host round-trips;
- the importance map and normalization count are computed in-graph (the count
  rides along as an extra accumulated channel), so the traced program embeds
  NO large constants — important because remote-compile services cap request
  size, and closure constants the size of the volume would blow it.

Supports constant and gaussian importance maps (MONAI BlendMode parity).

Predictor parameters should be passed via ``predictor_args`` (becoming jit
arguments), not captured in the predictor closure: captured arrays are
serialized into the HLO upload.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _scan_starts(image: int, roi: int, overlap: float) -> List[int]:
    """MONAI dense_patch_slices grid along one axis."""
    if roi >= image:
        return [0]
    interval = max(int(roi * (1.0 - overlap)), 1)
    num = int(np.ceil((image - roi) / interval)) + 1
    starts = []
    for i in range(num):
        start = min(i * interval, image - roi)
        if not starts or start != starts[-1]:
            starts.append(start)
    return starts


def window_grid(image_size: Sequence[int], roi_size: Sequence[int],
                overlap: float = 0.25) -> List[Tuple[int, int, int]]:
    zs = _scan_starts(image_size[0], roi_size[0], overlap)
    ys = _scan_starts(image_size[1], roi_size[1], overlap)
    xs = _scan_starts(image_size[2], roi_size[2], overlap)
    return [(z, y, x) for z in zs for y in ys for x in xs]


def _importance_map(roi_size: Sequence[int], mode: str,
                    sigma_scale: float = 0.125) -> jax.Array:
    """Importance map computed IN-GRAPH (no host constants)."""
    if mode == "constant":
        return jnp.ones((*roi_size, 1), jnp.float32)
    if mode == "gaussian":
        axes = []
        for i, s in enumerate(roi_size):
            center = (s - 1) / 2.0
            sigma = max(s * sigma_scale, 1e-3)
            x = jax.lax.broadcasted_iota(jnp.float32, (roi_size[0], roi_size[1], roi_size[2]), i)
            axes.append(jnp.exp(-0.5 * ((x - center) / sigma) ** 2))
        m = axes[0] * axes[1] * axes[2]
        m = m / jnp.max(m)
        m = jnp.maximum(m, jnp.finfo(jnp.float32).tiny)
        return m[..., None]
    raise ValueError(f"unknown blend mode {mode!r}")


def sliding_window_inference(
    volume: jax.Array,
    predictor: Callable,
    *,
    roi_size: Sequence[int] = (96, 96, 96),
    sw_batch_size: int = 4,
    overlap: float = 0.25,
    mode: str = "constant",
    out_channels: int | None = None,
    predictor_args: Tuple = (),
) -> jax.Array:
    """Run ``predictor`` over overlapping ROI windows of ``volume``.

    Args:
        volume: ``(1, D, H, W, C)`` (single full volume; batching across
            patients belongs on a mesh axis, not here).
        predictor: maps ``(n, *roi, C), *predictor_args -> (n, *roi, C_out)``;
            traced once with the sw batch shape.
        out_channels: output channel count (defaults to input C; pass when the
            predictor changes channel count, e.g. 1→8-class seg).
        predictor_args: extra arguments forwarded to the predictor (model
            variables belong here, NOT in the closure).

    Returns:
        ``(1, D, H, W, C_out)`` blended output.
    """
    if volume.shape[0] != 1:
        raise ValueError("sliding_window_inference expects batch size 1")
    _, d, h, w, c = volume.shape
    roi = tuple(int(r) for r in roi_size)
    pads = [max(0, roi[i] - volume.shape[1 + i]) for i in range(3)]
    if any(pads):
        volume = jnp.pad(volume, ((0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)))
    full = volume.shape[1:4]

    grid = window_grid(full, roi, overlap)
    n_win = len(grid)
    n_batches = -(-n_win // sw_batch_size)
    # pad grid by repeating the last window; its contribution is divided out
    # exactly because the accumulated count channel counts every window.
    padded = grid + [grid[-1]] * (n_batches * sw_batch_size - n_win)

    imp = _importance_map(roi, mode)                       # (*roi, 1), in-graph
    starts = jnp.asarray(padded, jnp.int32).reshape(n_batches, sw_batch_size, 3)
    c_out = int(out_channels) if out_channels is not None else c

    def gather_one(start):
        win = jax.lax.dynamic_slice(
            volume, (0, start[0], start[1], start[2], 0), (1, *roi, c))
        return win[0]

    # accumulate (pred · imp, imp) together: last channel is the count map
    acc_init = jnp.zeros((*full, c_out + 1), jnp.float32)

    def body(acc, batch_starts):
        wins = jax.vmap(gather_one)(batch_starts)          # (sw, *roi, C)
        preds = predictor(wins, *predictor_args).astype(jnp.float32)
        contrib = jnp.concatenate(
            [preds * imp[None], jnp.broadcast_to(imp[None], (sw_batch_size, *roi, 1))],
            axis=-1)

        def scatter(acc, i):
            s = batch_starts[i]
            idx = (s[0], s[1], s[2], 0)
            patch = jax.lax.dynamic_slice(acc, idx, (*roi, c_out + 1))
            return jax.lax.dynamic_update_slice(acc, patch + contrib[i], idx), None

        acc, _ = jax.lax.scan(scatter, acc, jnp.arange(sw_batch_size))
        return acc, None

    acc, _ = jax.lax.scan(body, acc_init, starts)
    out = acc[..., :c_out] / acc[..., c_out:]
    out = out[None]
    if any(pads):
        out = out[:, :d, :h, :w]
    return out


def make_sliding_window_sharded_fn(
    predictor: Callable,
    mesh,
    *,
    axis: str = "data",
    roi_size: Sequence[int] = (96, 96, 96),
    overlap: float = 0.25,
    mode: str = "constant",
    out_channels: int | None = None,
):
    """Multi-chip sliding window: the WINDOW batch is sharded over a mesh axis
    (the workload's closest analogue to sequence parallelism — SURVEY.md §5.7:
    spatial tiling sharded across devices).

    All windows are gathered into one (n_win, *roi, C) batch whose leading dim
    carries a sharding constraint on ``axis``; each device runs the predictor
    on its shard, and the blend (a linear scatter-add) runs on the gathered
    results. GSPMD inserts the all-gather over ICI. n_win is padded to a
    multiple of the axis size by repeating the last window (exactly divided
    out by the count channel, like sw-batch padding in the local engine).

    Returns a jit-once ``run(volume, *predictor_args)``; repeat calls with the
    same volume shape reuse the compiled program (no retrace). The window grid
    is derived from the static volume shape at trace time.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    roi = tuple(int(r) for r in roi_size)
    n_dev = mesh.shape[axis]

    def run(volume, *p_args):
        _, d, h, w, c = volume.shape
        pads = [max(0, roi[i] - volume.shape[1 + i]) for i in range(3)]
        if any(pads):
            volume = jnp.pad(volume, ((0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)))
        full = volume.shape[1:4]
        grid = window_grid(full, roi, overlap)
        padded = grid + [grid[-1]] * ((-len(grid)) % n_dev)
        starts = jnp.asarray(padded, jnp.int32)
        c_out = int(out_channels) if out_channels is not None else c
        imp = _importance_map(roi, mode)

        def gather_one(start):
            return jax.lax.dynamic_slice(
                volume, (0, start[0], start[1], start[2], 0), (1, *roi, c))[0]

        wins = jax.vmap(gather_one)(starts)
        wins = jax.lax.with_sharding_constraint(
            wins, NamedSharding(mesh, P(axis)))
        preds = predictor(wins, *p_args).astype(jnp.float32)
        preds = jax.lax.with_sharding_constraint(
            preds, NamedSharding(mesh, P(axis)))
        contrib = jnp.concatenate(
            [preds * imp[None],
             jnp.broadcast_to(imp[None], (len(padded), *roi, 1))], axis=-1)

        def scatter(acc, i):
            s = starts[i]
            idx = (s[0], s[1], s[2], 0)
            patch = jax.lax.dynamic_slice(acc, idx, (*roi, c_out + 1))
            return jax.lax.dynamic_update_slice(acc, patch + contrib[i], idx), None

        acc, _ = jax.lax.scan(scatter, jnp.zeros((*full, c_out + 1), jnp.float32),
                              jnp.arange(len(padded)))
        out = (acc[..., :c_out] / acc[..., c_out:])[None]
        if any(pads):
            out = out[:, :d, :h, :w]
        return out

    jitted = jax.jit(run)

    def wrapper(volume, *predictor_args):
        with mesh:
            return jitted(volume, *predictor_args)

    wrapper._jitted = jitted  # exposed for cache/trace introspection in tests
    return wrapper


# one compiled program per (predictor, mesh, config); repeat one-shot calls hit
# it. LRU-bounded: callers that pass a fresh lambda per call would otherwise
# accumulate one compiled program per call forever (predictor identity is part
# of the key). Stable callables are the supported fast path.
_SHARDED_FN_CACHE: OrderedDict = OrderedDict()
_SHARDED_FN_CACHE_MAX = 16


def sliding_window_inference_sharded(
    volume: jax.Array,
    predictor: Callable,
    mesh,
    *,
    axis: str = "data",
    roi_size: Sequence[int] = (96, 96, 96),
    overlap: float = 0.25,
    mode: str = "constant",
    out_channels: int | None = None,
    predictor_args: Tuple = (),
) -> jax.Array:
    """One-shot wrapper over :func:`make_sliding_window_sharded_fn`, memoized
    so repeat calls with the same predictor/mesh/config reuse the compiled
    program instead of re-jitting a fresh closure each time."""
    if volume.shape[0] != 1:
        raise ValueError("sliding_window_inference_sharded expects batch size 1")
    key = (predictor, mesh, axis, tuple(int(r) for r in roi_size), overlap,
           mode, out_channels)
    fn = _SHARDED_FN_CACHE.get(key)
    if fn is None:
        fn = _SHARDED_FN_CACHE.setdefault(key, make_sliding_window_sharded_fn(
            predictor, mesh, axis=axis, roi_size=roi_size, overlap=overlap,
            mode=mode, out_channels=out_channels))
        while len(_SHARDED_FN_CACHE) > _SHARDED_FN_CACHE_MAX:
            _SHARDED_FN_CACHE.popitem(last=False)
    else:
        _SHARDED_FN_CACHE.move_to_end(key)
    return fn(volume, *predictor_args)


def make_sliding_window_fn(
    predictor: Callable,
    *,
    roi_size: Sequence[int] = (96, 96, 96),
    sw_batch_size: int = 4,
    overlap: float = 0.25,
    mode: str = "constant",
    out_channels: int | None = None,
):
    """jit-wrapped sliding-window closure for repeated full-volume inference.

    Returns ``run(volume, *predictor_args)``; pass model variables through
    ``predictor_args`` so they are jit arguments, not traced constants.
    """

    @jax.jit
    def run(volume, *predictor_args):
        return sliding_window_inference(
            volume, predictor, roi_size=roi_size, sw_batch_size=sw_batch_size,
            overlap=overlap, mode=mode, out_channels=out_channels,
            predictor_args=predictor_args)

    return run

"""On-device sliding-window inference engine.

The reference calls MONAI's host-driven sliding_window_inference (96³ ROI,
sw_batch 4, overlap 0.25, constant blending; train_light_transeg.py:209-211,
train_light_linked_model.py:152-154). Here the whole sweep is ONE jit program:

- the window grid is computed at trace time (static shapes, MONAI dense-grid
  spacing: interval = roi·(1−overlap), last window clamped flush to the edge);
- windows are gathered with lax.dynamic_slice, batched on the sw axis, pushed
  through the predictor, and blended back with read-modify-write
  dynamic_update_slice adds inside a lax.scan — no host round-trips;
- the normalization count map is a compile-time numpy constant (the grid is
  static), so blending costs one multiply-add per window plus one divide.

Supports constant and gaussian importance maps (MONAI BlendMode parity).
"""

from __future__ import annotations

from functools import partial
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


def _importance_map(roi_size: Sequence[int], mode: str, sigma_scale: float = 0.125) -> np.ndarray:
    if mode == "constant":
        return np.ones(tuple(roi_size), np.float32)
    if mode == "gaussian":
        grids = []
        for s in roi_size:
            center = (s - 1) / 2.0
            sigma = max(s * sigma_scale, 1e-3)
            x = np.arange(s, dtype=np.float64)
            grids.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
        m = grids[0][:, None, None] * grids[1][None, :, None] * grids[2][None, None, :]
        m = np.clip(m / m.max(), np.finfo(np.float32).tiny, None)
        return m.astype(np.float32)
    raise ValueError(f"unknown blend mode {mode!r}")


def sliding_window_inference(
    volume: jax.Array,
    predictor: Callable[[jax.Array], jax.Array],
    *,
    roi_size: Sequence[int] = (96, 96, 96),
    sw_batch_size: int = 4,
    overlap: float = 0.25,
    mode: str = "constant",
    out_channels: int | None = None,
) -> jax.Array:
    """Run ``predictor`` over overlapping ROI windows of ``volume``.

    Args:
        volume: ``(1, D, H, W, C)`` (single full volume; batching across
            patients belongs on a mesh axis, not here).
        predictor: maps ``(n, *roi, C) -> (n, *roi, C_out)``; it is traced once
            with the sw batch shape.
        out_channels: output channel count (defaults to input C; pass when the
            predictor changes channel count, e.g. 1→8-class seg).

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
    # exactly because the count map counts every gathered window.
    padded = grid + [grid[-1]] * (n_batches * sw_batch_size - n_win)

    imp = _importance_map(roi, mode)
    count = np.zeros((*full, 1), np.float32)
    for (z, y, x) in padded:
        count[z:z + roi[0], y:y + roi[1], x:x + roi[2], 0] += imp
    count_map = jnp.asarray(count)
    imp_dev = jnp.asarray(imp)[None, ..., None]

    starts = jnp.asarray(padded, jnp.int32).reshape(n_batches, sw_batch_size, 3)
    c_out = int(out_channels) if out_channels is not None else c

    def gather_one(start):
        win = jax.lax.dynamic_slice(
            volume, (0, start[0], start[1], start[2], 0), (1, *roi, c))
        return win[0]

    out_init = jnp.zeros((*full, c_out), jnp.float32)

    def body(acc, batch_starts):
        wins = jax.vmap(gather_one)(batch_starts)          # (sw, *roi, C)
        preds = predictor(wins).astype(jnp.float32)        # (sw, *roi, C_out)
        preds = preds * imp_dev

        def scatter(acc, i):
            s = batch_starts[i]
            idx = (s[0], s[1], s[2], 0)
            patch = jax.lax.dynamic_slice(acc, idx, (*roi, c_out))
            return jax.lax.dynamic_update_slice(acc, patch + preds[i], idx), None

        acc, _ = jax.lax.scan(scatter, acc, jnp.arange(sw_batch_size))
        return acc, None

    out, _ = jax.lax.scan(body, out_init, starts)
    out = out / count_map
    out = out[None]
    if any(pads):
        out = out[:, :d, :h, :w]
    return out


def make_sliding_window_fn(
    predictor: Callable[[jax.Array], jax.Array],
    *,
    roi_size: Sequence[int] = (96, 96, 96),
    sw_batch_size: int = 4,
    overlap: float = 0.25,
    mode: str = "constant",
    out_channels: int | None = None,
):
    """jit-wrapped sliding-window closure for repeated full-volume inference."""

    @jax.jit
    def run(volume):
        return sliding_window_inference(
            volume, predictor, roi_size=roi_size, sw_batch_size=sw_batch_size,
            overlap=overlap, mode=mode, out_channels=out_channels)

    return run

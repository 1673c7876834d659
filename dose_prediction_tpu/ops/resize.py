"""Separable 3D resize with PyTorch interpolate() semantics, as axis matmuls.

TPU-first design: instead of gather-based interpolation (scalar-ish, VPU
bound), each spatial axis is resampled with a dense (out, in) interpolation
matrix contracted on the MXU. The matrices are built host-side at trace time
(static shapes) so the whole resize is three small einsums that XLA fuses.

Supported modes (parity targets in the reference):
- ``trilinear`` + align_corners=True  — UpConv upsampling (c3d.py:36) and
  GenLoss deep-supervision downsampling (DosePrediction/Train/loss.py:63).
- ``trilinear`` + align_corners=False — torch default.
- ``nearest-exact``                   — GenLoss mask downsampling (loss.py:64).
- ``nearest``                         — torch legacy nearest.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix(
    in_size: int, out_size: int, mode: str, align_corners: bool
) -> np.ndarray:
    """Dense (out_size, in_size) resampling matrix, float32."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if mode == "linear":
        if align_corners:
            src = i * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = np.clip((i + 0.5) * in_size / out_size - 0.5, 0.0, in_size - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = (src - lo).astype(np.float64)
        np.add.at(m, (np.arange(out_size), lo), (1.0 - frac).astype(np.float32))
        np.add.at(m, (np.arange(out_size), hi), frac.astype(np.float32))
    elif mode == "nearest":
        idx = np.minimum(np.floor(i * in_size / out_size), in_size - 1).astype(np.int64)
        m[np.arange(out_size), idx] = 1.0
    elif mode == "nearest-exact":
        idx = np.minimum(np.floor((i + 0.5) * in_size / out_size), in_size - 1).astype(np.int64)
        m[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    return m


def resize3d(
    x: jax.Array,
    out_size: Sequence[int],
    *,
    mode: str = "trilinear",
    align_corners: bool = False,
) -> jax.Array:
    """Resize an NDHWC volume to ``out_size = (D', H', W')``.

    Each axis is contracted with its interpolation matrix; nearest modes use
    0/1 matrices so the same MXU path implements them exactly.
    """
    if mode == "trilinear":
        axis_mode = "linear"
    elif mode in ("nearest", "nearest-exact"):
        axis_mode = mode
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    d_out, h_out, w_out = (int(s) for s in out_size)
    n, d, h, w, c = x.shape
    dtype = x.dtype
    y = x.astype(jnp.float32)
    if d_out != d:
        md = jnp.asarray(_interp_matrix(d, d_out, axis_mode, align_corners))
        y = jnp.einsum("od,ndhwc->nohwc", md, y)
    if h_out != h:
        mh = jnp.asarray(_interp_matrix(h, h_out, axis_mode, align_corners))
        y = jnp.einsum("oh,ndhwc->ndowc", mh, y)
    if w_out != w:
        mw = jnp.asarray(_interp_matrix(w, w_out, axis_mode, align_corners))
        y = jnp.einsum("ow,ndhwc->ndhoc", mw, y)
    return y.astype(dtype)


def upsample3d(
    x: jax.Array, scale: int = 2, *, mode: str = "trilinear", align_corners: bool = True
) -> jax.Array:
    """Scale-factor upsampling (reference F.interpolate(scale_factor=2))."""
    _, d, h, w, _ = x.shape
    return resize3d(x, (d * scale, h * scale, w * scale), mode=mode, align_corners=align_corners)


def downsample_pyramid(
    volume: jax.Array,
    mask: jax.Array,
    *,
    levels: Tuple[int, ...] = (2, 4, 8),
) -> Tuple[list, list]:
    """GenLoss.downSample parity: trilinear(align_corners=True) volumes and
    nearest-exact masks at ``size / level`` for each pyramid level
    (DosePrediction/Train/loss.py:57-67)."""
    _, d, h, w, _ = volume.shape
    vols, masks = [], []
    for f in levels:
        size = (d // f, h // f, w // f)
        vols.append(resize3d(volume, size, mode="trilinear", align_corners=True))
        masks.append(resize3d(mask, size, mode="nearest-exact"))
    return vols, masks

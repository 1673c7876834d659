"""3D convolution primitives, channels-last (NDHWC), torch-compatible padding.

TPU notes:
- NDHWC keeps channels on the 128-lane minor axis; XLA lowers these convs onto
  the MXU as implicit GEMMs.
- Padding is always *explicit symmetric* (PyTorch semantics), never XLA "SAME":
  for strided convs the two conventions place the window grid differently even
  when output shapes agree (parity with reference nn.Conv3d, e.g.
  DosePrediction/Models/Networks/c3d.py:16).
- Accumulation dtype defaults to float32 (preferred_element_type) so bfloat16
  activations keep full-precision partial sums in the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr3 = Union[int, Sequence[int]]

_DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")


def _triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    if len(t) != 3:
        raise ValueError(f"expected int or length-3 sequence, got {v!r}")
    return t  # type: ignore[return-value]


def conv3d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    dilation: IntOr3 = 1,
    groups: int = 1,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """3D convolution.

    Args:
        x: input volume ``(N, D, H, W, Cin)``.
        w: kernel ``(kd, kh, kw, Cin // groups, Cout)``.
        b: optional bias ``(Cout,)``.
        stride / padding / dilation: int or 3-tuple, PyTorch semantics
            (symmetric zero padding of ``padding`` voxels per side).
        groups: feature group count.
        accum_dtype: MXU accumulation dtype.

    Returns:
        ``(N, D', H', W', Cout)`` in ``x.dtype``.
    """
    stride = _triple(stride)
    padding = _triple(padding)
    dilation = _triple(dilation)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, _DIMENSION_NUMBERS)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=accum_dtype,
    )
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


def conv_transpose3d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    output_padding: IntOr3 = 0,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """3D transposed convolution with PyTorch ConvTranspose3d semantics.

    Implemented as the standard gradient-of-conv identity: dilate the input by
    ``stride`` (lhs_dilation), spatially flip the kernel, swap its in/out
    channels, and convolve with per-side padding ``k - 1 - p`` (plus
    ``output_padding`` on the high side). Output size is
    ``(in - 1) * stride - 2 * padding + dilation * (k - 1) + output_padding + 1``,
    matching reference ConvTranspose3d usage (k=2, s=2 up-projections in the
    UNETR block family, OARSegmentation/Models/Nets/base_blocks.py:118-127).

    Args:
        x: ``(N, D, H, W, Cin)``.
        w: kernel ``(kd, kh, kw, Cin, Cout)`` — note IO order matches conv3d; the
           channel swap is internal.
    """
    stride = _triple(stride)
    padding = _triple(padding)
    output_padding = _triple(output_padding)
    kd, kh, kw = w.shape[:3]
    ks = (kd, kh, kw)
    for k, s, p, op in zip(ks, stride, padding, output_padding):
        if op >= s and op >= 1:
            raise ValueError("output_padding must be smaller than stride")
        if k - 1 - p < 0:
            raise ValueError("padding too large for kernel")
    # flip spatially; IO layout of w is already (..., Cin, Cout) which after the
    # lhs-dilated convolution contracts x's Cin correctly.
    w_flip = w[::-1, ::-1, ::-1]
    pad_cfg = [
        (k - 1 - p, k - 1 - p + op)
        for k, p, op in zip(ks, padding, output_padding)
    ]
    dn = lax.conv_dimension_numbers(x.shape, w_flip.shape, _DIMENSION_NUMBERS)
    out = lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1, 1, 1),
        padding=pad_cfg,
        lhs_dilation=stride,
        dimension_numbers=dn,
        preferred_element_type=accum_dtype,
    )
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


@partial(jax.jit, static_argnames=("window", "stride"))
def max_pool3d(x: jax.Array, window: IntOr3 = 2, stride: IntOr3 | None = None) -> jax.Array:
    """3D max pooling, NDHWC, no padding (reference MaxPool3d(2) in hdunet.py:44)."""
    window = _triple(window)
    stride = window if stride is None else _triple(stride)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )


def avg_pool3d(x: jax.Array, window: IntOr3 = 2, stride: IntOr3 | None = None) -> jax.Array:
    """3D average pooling, NDHWC, no padding."""
    window = _triple(window)
    stride = window if stride is None else _triple(stride)
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding="VALID",
    )
    return (summed / float(window[0] * window[1] * window[2])).astype(x.dtype)

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


def _pet(x_dtype, accum_dtype):
    """preferred_element_type guard: this JAX version's conv transpose rule
    rejects mixed dtypes, so upcasting outputs breaks training with bf16
    inputs. The TPU MXU accumulates bf16 convs in f32 internally regardless,
    so dropping the explicit upcast costs only output rounding."""
    return accum_dtype if jnp.dtype(x_dtype) == jnp.dtype(accum_dtype) else None


def _conv3d_xla(x, w, b, stride, padding, dilation, groups, accum_dtype):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, _DIMENSION_NUMBERS)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=_pet(x.dtype, accum_dtype),
    )
    if b is not None:
        out = out.astype(accum_dtype) + b.astype(accum_dtype)
    return out.astype(x.dtype)


def _conv3d_decomposed(x, w, b, stride, padding, dilation, accum_dtype):
    """3D conv as a shift-sum of kd 2D convs over depth taps.

    XLA-TPU's rank-5 convolution lowering runs at single-digit TFLOP/s for
    this workload's shapes; decomposing the depth axis into kd rank-4 convs
    (depth folded into the batch dim) measured 26.7 vs 8.3 TF/s for the k=7
    multi-scale branches — exact to float tolerance.
    """
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    (sd, sh, sw) = stride
    (pd, ph, pw) = padding
    (dd, dh_, dw_) = dilation
    out_d = (d + 2 * pd - dd * (kd - 1) - 1) // sd + 1
    xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
    dn = None
    out = None
    for dz in range(kd):
        start = dz * dd
        sl = xp[:, start: start + (out_d - 1) * sd + 1: sd]
        sl = sl.reshape(n * out_d, h, wd, cin)
        w2 = w[dz]
        if dn is None:
            dn = lax.conv_dimension_numbers(sl.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            sl, w2, (sh, sw), [(ph, ph), (pw, pw)],
            rhs_dilation=(dh_, dw_), dimension_numbers=dn,
            preferred_element_type=_pet(x.dtype, accum_dtype),
        ).astype(accum_dtype)  # tap accumulation in f32
        out = y if out is None else out + y
    out = out.reshape(n, out_d, out.shape[1], out.shape[2], cout)
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


def _lanefold_factor(wd: int, cout: int) -> int:
    """Largest power-of-two fold F ≤ 128//cout that divides W."""
    f = max(1, 128 // cout)
    while f > 1 and wd % f:
        f //= 2
    return f


def _lanefold_applicable(x_shape, w_shape, stride, padding, dilation, groups) -> bool:
    kd, kh, kw, _, cout = w_shape
    wd = x_shape[3]
    return (
        groups == 1
        and stride == (1, 1, 1)
        and (kd, kh, kw) == (3, 3, 3)
        and all(2 * p == dl * (k - 1) for k, p, dl in zip((kd, kh, kw), padding, dilation))
        and cout <= 64
        and _lanefold_factor(wd, cout) >= 2
    )


def _conv3d_lanefold(x, w, b, padding, dilation, accum_dtype):
    """Same-size k3 conv as LANE-PACKED matmuls.

    The architecture's narrow channel counts (Cout = 16..64) leave most of
    the MXU's 128 result lanes idle in any per-position lowering — the
    ~14 TF/s "narrow-channel ceiling" in docs/PERFORMANCE.md. This path packs
    F = 128//Cout consecutive output w-positions into the lane axis instead:

    - w-axis: outputs are grouped into blocks of F; each block's inputs are a
      window of F + dil·(kw−1) positions, flattened with Cin into the
      contraction axis. The kw taps live inside a BANDED expanded weight
      matrix Wexp[(p, ci), (δ, co)] = w[(p−δ)/dil, ci, co] — so one matmul
      computes all F positions × Cout channels = 128 dense lanes.
    - d/h axes: shift-sum over the kd·kh taps (f32 accumulation), like
      _conv3d_decomposed.

    Useful-FLOP density is kw/(F + dil·(kw−1)) per matmul (30% at C=16,
    50% at C=32, 75% at C=64), but the matmuls run at full-lane MXU rates, a
    net ~3× over the per-position forms at C=16. Exact to float tolerance.
    """
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    (pd, ph, pw) = padding
    (dd, dh_, dw_) = dilation
    f = _lanefold_factor(wd, cout)
    win = f + dw_ * (kw - 1)
    nb = wd // f
    xp = jnp.pad(x, ((0, 0), (pd, pd), (ph, ph), (pw, pw), (0, 0)))
    dp, hp = d + 2 * pd, h + 2 * ph
    # overlapping w-blocks: (N, Dp, Hp, nb, win·Cin)
    patches = jnp.stack(
        [lax.slice_in_dim(xp, bs, bs + win, axis=3) for bs in range(0, wd, f)],
        axis=3,
    ).reshape(n, dp, hp, nb, win * cin)

    wt = w.astype(x.dtype)
    out = None
    for dz in range(kd):
        for hz in range(kh):
            # banded expansion of the kw taps: lane (δ, co) reads input
            # positions δ + dil·t for t in 0..kw-1
            wexp = jnp.zeros((win, cin, f, cout), wt.dtype)
            for delta in range(f):
                wexp = wexp.at[delta:delta + dw_ * (kw - 1) + 1:dw_, :, delta, :].set(
                    wt[dz, hz])
            wexp = wexp.reshape(win * cin, f * cout)
            sl = lax.slice_in_dim(
                lax.slice_in_dim(patches, dz * dd, dz * dd + d, axis=1),
                hz * dh_, hz * dh_ + h, axis=2)
            y = jnp.dot(sl.reshape(-1, win * cin), wexp,
                        preferred_element_type=accum_dtype)
            out = y if out is None else out + y
    out = out.reshape(n, d, h, wd, cout)
    if b is not None:
        out = out + b.astype(accum_dtype)
    return out.astype(x.dtype)


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
    method: str = "auto",
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
        method: 'auto' (lane-folded matmuls for same-size narrow-channel k3;
            depth-decomposed 2D convs for other kd≥3 / depth-dilated kernels),
            'xla' (direct rank-5 conv), 'decomposed', or 'lanefold'.

    Returns:
        ``(N, D', H', W', Cout)`` in ``x.dtype``.
    """
    stride = _triple(stride)
    padding = _triple(padding)
    dilation = _triple(dilation)
    kd = w.shape[0]
    # lanefold is opt-in only: measured on the live v5e it loses to the
    # decomposed path (patch materialization + tall-skinny dot rates — see
    # docs/PERFORMANCE.md "round-2 conv study"); kept for wide-lane parts
    # and future Pallas composition.
    use_lanefold = method == "lanefold"
    if use_lanefold:
        return _conv3d_lanefold(x, w, b, padding, dilation, accum_dtype)
    # Pallas direct k3 kernel — opt-in via method='pallas' or the
    # DPT_PALLAS_CONV flag ('1' = 256-lane band, 'tight' = (F+2)·C band).
    # In-model measurement on the seg sweep: docs/PERFORMANCE.md round-4.
    pallas_mode = None
    if method == "pallas":
        pallas_mode = "1"
    elif method == "auto":
        from dose_prediction_tpu.core.config import FLAGS

        if FLAGS.use_pallas_conv3d in ("1", "tight"):
            pallas_mode = FLAGS.use_pallas_conv3d
    if (pallas_mode is not None and groups == 1
            and w.shape[:3] == (3, 3, 3) and stride == (1, 1, 1)
            and dilation == (1, 1, 1) and padding == (1, 1, 1)
            and x.shape[-1] == w.shape[-1] and x.shape[-1] in (16, 32, 64)):
        from dose_prediction_tpu.kernels.conv3d import conv3d_k3

        return conv3d_k3(x, w, b, tight_band=pallas_mode == "tight")
    use_decomp = method == "decomposed" or (
        method == "auto" and groups == 1 and (kd >= 3 or dilation[0] > 1)
    )
    if use_decomp:
        return _conv3d_decomposed(x, w, b, stride, padding, dilation, accum_dtype)
    return _conv3d_xla(x, w, b, stride, padding, dilation, groups, accum_dtype)


def conv_transpose3d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    output_padding: IntOr3 = 0,
    accum_dtype=jnp.float32,
    method: str = "auto",
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
    # Depth-phase decomposition for kd == sd, pd == 0 (every UNETR k2 s2
    # up-projection): each output depth plane y[:, sd·z + a] receives
    # contribution from exactly one input plane through the 2D tap w[a], so
    # the op is kd independent rank-4 transposed convs (depth folded into the
    # batch) interleaved along depth — the same rank-5→rank-4 rewrite that
    # speeds the forward convs.
    if (
        method in ("auto", "depth") and kd == stride[0] and padding[0] == 0
        and output_padding == (0, 0, 0)
    ):
        n, d, h, wd, cin = x.shape
        cout = w.shape[-1]
        x4 = x.reshape(n * d, h, wd, cin)
        planes = []
        for a in range(kd):
            w2 = w[a, ::-1, ::-1]                     # (kh, kw, cin, cout), flipped
            dn = lax.conv_dimension_numbers(x4.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
            pad2 = [(kh - 1 - padding[1], kh - 1 - padding[1]),
                    (kw - 1 - padding[2], kw - 1 - padding[2])]
            y = lax.conv_general_dilated(
                x4, w2, (1, 1), pad2, lhs_dilation=(stride[1], stride[2]),
                dimension_numbers=dn,
                preferred_element_type=_pet(x.dtype, accum_dtype),
            )
            planes.append(y)
        out = jnp.stack(planes, axis=1)               # (N·D, kd, H', W', Cout)
        oh, ow = out.shape[2], out.shape[3]
        out = out.reshape(n, d * kd, oh, ow, cout)
        if b is not None:
            out = out.astype(accum_dtype) + b.astype(accum_dtype)
        return out.astype(x.dtype)

    # Optional matmul path for k == stride, padding 0 up-projections: the
    # whole op is ONE (voxels, Cin) @ (Cin, k³·Cout) matmul followed by a
    # depth-to-space reshuffle. Faster in isolation, but measured SLOWER
    # inside the full models (the interleaving transpose breaks XLA's layout
    # propagation into the following concat+conv), so it is opt-in.
    if method == "matmul" and ks == stride and padding == (0, 0, 0) and output_padding == (0, 0, 0):
        n, d, h, wd, cin = x.shape
        cout = w.shape[-1]
        wm = w.transpose(3, 0, 1, 2, 4).reshape(cin, kd * kh * kw * cout)
        y = jnp.dot(
            x.reshape(n * d * h * wd, cin).astype(x.dtype),
            wm.astype(x.dtype),
            preferred_element_type=accum_dtype,
        )
        y = y.reshape(n, d, h, wd, kd, kh, kw, cout)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(n, d * kd, h * kh, wd * kw, cout)
        if b is not None:
            y = y + b.astype(accum_dtype)
        return y.astype(x.dtype)
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
        preferred_element_type=_pet(x.dtype, accum_dtype),
    )
    if b is not None:
        out = out.astype(accum_dtype) + b.astype(accum_dtype)
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

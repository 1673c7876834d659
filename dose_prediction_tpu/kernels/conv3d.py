"""Pallas TPU kernel: direct same-size k3 3D convolution for narrow channels.

Why (docs/PERFORMANCE.md round-2 conv study): XLA's conv lowering is at the
C_out-lane ceiling (68.9 TF/s peak × C/128) at 128³ but loses another ~2× to
spatial tiling at the 96³ seg-window shapes, and every XLA-level rewrite
(lane-folding, space-to-depth, depth-folding) pays patch/relayout HBM traffic
that eats the win. This kernel keeps the patch structure in VMEM only:

- the volume is viewed as rows (N, D, H) × lanes (W·C), padded to
  (N, D+2, H+2, Lp) with the w-axis left-padded by 1 and right-padded so
  Lp = (W + 2 + pad)·C is a multiple of 128 with one trailing block of slack;
- the kernel DMAs a (TD+2, H+2, Lp) row-window from HBM into VMEM once per
  grid cell (halo rows re-read, everything else read exactly once);
- for each (d-tap, h-tap, local-d, w-block) it issues a dense
  (H, 256) @ (256, C·F) matmul against a BANDED weight matrix
  Wexp[(p, ci), (δ, co)] = w[td, th, p−δ, ci, co] (p−δ ∈ {0,1,2}), where
  F = 128//C output w-positions share the 128 result lanes — the MXU runs
  dense while the band carries the k3 taps;
- partial sums accumulate in an f32 VMEM scratch; one bf16 write per output.

Exposed as ``conv3d_k3(x, w, b)`` with a custom VJP whose backward runs the
XLA reference path (training numerics identical; the kernel serves the
forward/inference hot path). Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _expand_weights(w: jax.Array, f: int, c: int, win_lanes: int) -> jax.Array:
    """(3,3,3,C,Cout) → (9, win_lanes, F·Cout) banded: for each (td,th), rows
    are the win_lanes-lane input window starting at lane 128b in
    (w-position, ci) layout, cols are (δ, co) output lanes; entries
    w[td,th,t] at row (δ+t)·C+ci.

    The window covers positions p = 0..(win_lanes/C − 1) relative to lane
    128b; output δ needs p = δ..δ+2, so win_lanes ≥ (F+2)·C. win_lanes=256
    keeps every matmul 128-register aligned; win_lanes=(F+2)·C is the tight
    band (less wasted MXU work IF Mosaic handles non-128 contractions).
    """
    cout = w.shape[-1]
    win_pos = win_lanes // c
    # constant band-selection tensor (trace-safe): sel[p, δ, t] = [p == δ + t]
    sel = np.zeros((win_pos, f, 3), np.float32)
    for delta in range(f):
        for t in range(3):
            sel[delta + t, delta, t] = 1.0
    wexp = jnp.einsum("pdt,abtio->abpido", jnp.asarray(sel, w.dtype), w)
    return wexp.reshape(9, win_pos * c, f * cout)


def _kernel(x_hbm, wexp_ref, o_ref, buf, acc, sem, *, td_chunk: int, h: int,
            nb: int, f: int, win_lanes: int):
    """Grid: (num_d_chunks,). x_hbm: (DP, HP, Lp) in ANY/HBM.
    buf: VMEM (td_chunk+2, HP, Lp); acc: VMEM (td_chunk, h, out_l) f32."""
    i = pl.program_id(0)

    # copy the row window (with d-halo) HBM → VMEM
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * td_chunk, td_chunk + 2)], buf, sem)
    cp.start()
    cp.wait()

    acc[:] = jnp.zeros_like(acc)
    for td in range(3):
        for th in range(3):
            wmat = wexp_ref[td * 3 + th]                     # (win_lanes, F·C)
            for dl in range(td_chunk):
                a_full = buf[td + dl, pl.ds(th, h), :]       # (H, Lp)
                for b in range(nb):
                    a = a_full[:, b * 128: b * 128 + win_lanes]  # 128-aligned start
                    y = jnp.dot(a, wmat, preferred_element_type=jnp.float32)
                    # F·Cout == 128: one output lane-block per w-block
                    acc[dl, :, b * 128: b * 128 + 128] += y

    o_ref[:] = acc[:].astype(o_ref.dtype)


def _conv3d_k3_fwd(x: jax.Array, w: jax.Array, b: Optional[jax.Array],
                   *, td_chunk: int = 4, interpret: bool = False,
                   tight_band: bool = False) -> jax.Array:
    n, d, h, wd, c = x.shape
    cout = w.shape[-1]
    if n != 1:
        # fold batch into depth (independent slices; halo rows are zero-padded
        # per sample, so process each sample separately)
        outs = [_conv3d_k3_fwd(x[i:i + 1], w, b, td_chunk=td_chunk,
                               interpret=interpret, tight_band=tight_band)
                for i in range(n)]
        return jnp.concatenate(outs, axis=0)
    f = 128 // cout
    if c != cout or 128 % cout or wd % f:
        raise ValueError("conv3d_k3 supports C==Cout dividing 128 and W % (128//C) == 0")
    while d % td_chunk:
        td_chunk //= 2
    nb = wd // f
    out_l = wd * cout
    win_lanes = (f + 2) * c if tight_band else 256
    # lanes: left-pad w by 1, right-pad so the last window fits;
    # rows: HP must be 8-aligned (Mosaic sublane tiling on DMA slices)
    right = (nb * 128 + max(win_lanes, 256)) // c - (wd + 1)
    hp = -(-(h + 2) // 8) * 8
    xp = jnp.pad(x[0], ((1, 1), (1, hp - h - 1), (1, right), (0, 0)))
    dp = d + 2
    lp = (wd + 1 + right) * c
    x2 = xp.reshape(dp, hp, lp)

    wexp = _expand_weights(w, f, c, win_lanes).astype(x.dtype)

    grid = (d // td_chunk,)
    out = pl.pallas_call(
        functools.partial(_kernel, td_chunk=td_chunk, h=h, nb=nb, f=f,
                          win_lanes=win_lanes),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, win_lanes, f * cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((td_chunk, h, out_l), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, out_l), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((td_chunk + 2, hp, lp), x.dtype),
            pltpu.VMEM((td_chunk, h, out_l), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2, wexp)
    out = out.reshape(1, d, h, wd, cout)
    if b is not None:
        out = (out.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    return out


def conv3d_k3(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
              *, interpret: Optional[bool] = None,
              tight_band: bool = False) -> jax.Array:
    """Direct Pallas same-size k3 conv (stride 1, dilation 1, pad 1),
    C == Cout ∈ {16, 32, 64}. Differentiable (XLA-reference backward).
    ``tight_band`` shrinks the contraction window from 256 to (F+2)·C lanes
    (30% vs 18.75% useful density at C=16)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv3d_k3_core(x, w, b, interpret, tight_band)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3d_k3_core(x, w, b, interpret, tight_band):
    return _conv3d_k3_fwd(x, w, b, interpret=interpret, tight_band=tight_band)


def _reference(x, w, b):
    from dose_prediction_tpu.ops.conv import conv3d

    return conv3d(x, w, b, padding=1, method="decomposed")


def _core_fwd(x, w, b, interpret, tight_band):
    return (_conv3d_k3_fwd(x, w, b, interpret=interpret, tight_band=tight_band),
            (x, w, b))


def _core_bwd(interpret, tight_band, residuals, g):
    x, w, b = residuals
    if b is None:
        _, vjp = jax.vjp(lambda x_, w_: _reference(x_, w_, None), x, w)
        gx, gw = vjp(g)
        return gx, gw, None
    _, vjp = jax.vjp(_reference, x, w, b)
    return vjp(g)


_conv3d_k3_core.defvjp(_core_fwd, _core_bwd)

"""Pallas TPU kernel: fused InstanceNorm3d (+affine +activation).

InstanceNorm at full volume (e.g. 128³×32ch ≈ 268 MB fp32) is HBM-bound: XLA
emits a reduce pass then a normalize pass, and the activation may or may not
fuse into the second. This kernel pins the schedule: a two-phase grid where
phase 0 streams spatial chunks accumulating per-channel sum/sumsq in VMEM
scratch, and phase 1 streams them again applying normalize+affine+act in one
VPU pass — exactly 2 reads + 1 write of the volume, with f32 accumulation.

Exposed as ``instance_norm_act(x, scale, bias, act=...)`` with a custom VJP
(backward uses the saved statistics; see ops.norm.instance_norm for the
reference math). Falls back to the XLA path off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dose_prediction_tpu import ops


def _act_fn(name: str):
    return ops.get_act(name)


def _kernel(x_ref, scale_ref, bias_ref, o_ref, sum_ref, sumsq_ref,
            *, act: str, eps: float, n_spatial: int):
    phase = pl.program_id(0)
    chunk = pl.program_id(1)

    @pl.when(jnp.logical_and(phase == 0, chunk == 0))
    def _init():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)

    @pl.when(phase == 0)
    def _accumulate():
        x = x_ref[:].astype(jnp.float32)
        sum_ref[:] += jnp.sum(x, axis=0, keepdims=True)
        sumsq_ref[:] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _normalize():
        x = x_ref[:].astype(jnp.float32)
        n = jnp.float32(n_spatial)
        mean = sum_ref[:] / n
        var = sumsq_ref[:] / n - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean) * inv
        y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
        o_ref[:] = _act_fn(act)(y).astype(o_ref.dtype)


def _choose_chunk(s: int, c: int, dtype_bytes: int = 4) -> int:
    """Pick a spatial chunk so the (chunk, C) block fits in VMEM.

    VMEM blocks are padded to 128 lanes on the minor axis, so a narrow-C
    block physically occupies chunk × max(C,128) elements; with double
    buffering on both input and output windows, budget ~1.5 MB per block."""
    row_bytes = max(c, 128) * dtype_bytes
    budget = (3 * 1024 * 1024 // 2) // row_bytes
    chunk = max(8, min(s, budget))
    while s % chunk:
        chunk -= 1
    return chunk


@functools.partial(jax.jit, static_argnames=("act", "eps", "interpret"))
def _instance_norm_act_fwd(x, scale, bias, *, act: str, eps: float, interpret: bool):
    n, d, h, w, c = x.shape
    s = d * h * w
    xs = x.reshape(n, s, c)
    chunk = _choose_chunk(s, c)
    n_chunks = s // chunk

    def run_one(x1):
        return pl.pallas_call(
            functools.partial(_kernel, act=act, eps=eps, n_spatial=s),
            grid=(2, n_chunks),
            in_specs=[
                pl.BlockSpec((chunk, c), lambda p, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda p, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, c), lambda p, i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, c), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((1, c), jnp.float32),
                pltpu.VMEM((1, c), jnp.float32),
            ],
            interpret=interpret,
        )(x1, scale.reshape(1, c), bias.reshape(1, c))

    out = jax.vmap(run_one)(xs)
    return out.reshape(n, d, h, w, c)


def instance_norm_act(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    act: str = "identity",
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused InstanceNorm3d + affine + activation on TPU.

    Differentiable via the XLA reference implementation (jax.custom_vjp with
    an XLA backward keeps training numerics identical while inference uses
    the fused kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _instance_norm_act_core(x, scale, bias, act, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _instance_norm_act_core(x, scale, bias, act, eps, interpret):
    return _instance_norm_act_fwd(x, scale, bias, act=act, eps=eps, interpret=interpret)


def _reference(x, scale, bias, act, eps):
    return _act_fn(act)(ops.instance_norm(x, scale, bias, eps=eps))


def _core_fwd(x, scale, bias, act, eps, interpret):
    out = _instance_norm_act_fwd(x, scale, bias, act=act, eps=eps, interpret=interpret)
    return out, (x, scale, bias)


def _core_bwd(act, eps, interpret, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(lambda x_, s_, b_: _reference(x_, s_, b_, act, eps), x, scale, bias)
    return vjp(g)


_instance_norm_act_core.defvjp(_core_fwd, _core_bwd)

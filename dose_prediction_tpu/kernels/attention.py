"""Pallas TPU kernel: single-block fused multi-head self-attention.

The 3D ViT sequence is tiny — (img/16)³ tokens (512 for 128³, 216 for 96³) —
so the whole QK^T → softmax → PV chain for one (batch, head) fits in VMEM
(512×512 f32 scores = 1 MB). A flash-style streaming kernel is unnecessary;
the win is keeping scores/probs out of HBM entirely: one kernel, two MXU
matmuls, an in-register f32 softmax.

Grid: (batch × heads). Falls back to the XLA einsum path off-TPU and for
sequence lengths that don't fit the single-block budget.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SINGLE_BLOCK_TOKENS = 1024  # 1024² f32 scores = 4 MB VMEM


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)                # (L, Dh)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                          # (L, L)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference einsum path (also the custom-VJP backward)."""
    hd = q.shape[-1]
    scores = jnp.einsum("nhld,nhmd->nhlm", q, k,
                        preferred_element_type=jnp.float32).astype(jnp.float32)
    probs = jax.nn.softmax(scores * (hd ** -0.5), axis=-1).astype(q.dtype)
    return jnp.einsum("nhlm,nhmd->nhld", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_fwd(q, k, v, interpret: bool):
    n, h, l, dh = q.shape
    scale = dh ** -0.5
    qf = q.reshape(n * h, 1, l, dh)
    kf = k.reshape(n * h, 1, l, dh)
    vf = v.reshape(n * h, 1, l, dh)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(n * h,),
        in_specs=[
            pl.BlockSpec((1, 1, l, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, l, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h, 1, l, dh), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(n, h, l, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_core(q, k, v, interpret):
    return _fused_fwd(q, k, v, interpret)


def _fused_core_fwd(q, k, v, interpret):
    return _fused_fwd(q, k, v, interpret), (q, k, v)


def _fused_core_bwd(interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(xla_attention, q, k, v)
    return vjp(g)


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    *, interpret: Optional[bool] = None) -> jax.Array:
    """MHSA on (N, heads, L, head_dim) tensors; fused single-block kernel when
    the sequence fits, XLA einsum otherwise."""
    l = q.shape[2]
    if l > MAX_SINGLE_BLOCK_TOKENS:
        return xla_attention(q, k, v)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_core(q, k, v, interpret)

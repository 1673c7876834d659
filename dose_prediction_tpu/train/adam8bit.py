"""Block-wise 8-bit Adam — the TPU-native analogue of bitsandbytes Adam8bit
(the reference's optimizer, train_light_pyfer.py:12,195).

Optimizer state (m, v) is stored as int8 with one float32 scale per block of
``block_size`` elements (dynamic blockwise quantization, the same idea as
bnb's 8-bit optimizers): state memory drops ~3.5× vs float32 Adam, which for
the 168M-param flagship saves ~1.0 GB of HBM. The update itself runs in f32:
dequantize → adam math → requantize, fused by XLA on the VPU.

Small tensors (biases, norm scales, < min_quantize_size elements) keep f32
moments — quantizing them saves nothing and costs precision (bnb's
min_8bit_size behavior).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class Quantized(NamedTuple):
    """Signed linear block quantization (first moment m)."""

    values: jax.Array   # int8, (n_blocks, block_size)
    scales: jax.Array   # f32, (n_blocks,)


class LogQuantized(NamedTuple):
    """Log-domain block quantization for the non-negative second moment v.

    A linear int8 grid collapses small v entries within a block to zero,
    which inflates their adam steps and diverges training; encoding log(v)
    uniformly per block keeps ~constant RELATIVE precision across the
    block's dynamic range (the role of bitsandbytes' dynamic map)."""

    values: jax.Array   # uint8, (n_blocks, block_size)
    lo: jax.Array       # f32, (n_blocks,) log-domain lower bound
    scale: jax.Array    # f32, (n_blocks,) log-domain step


# floor added before log(); must stay in the normal f32 range — subnormals can
# flush to zero, making log() return -inf and poisoning the block stats
_LOG_TINY = 1e-30


def _quantize(x: jax.Array, block_size: int) -> Quantized:
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.shape[0]) % block_size
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block_size)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return Quantized(values=q, scales=scale[:, 0])


def _dequantize(q: Quantized, shape) -> jax.Array:
    flat = (q.values.astype(jnp.float32) * q.scales[:, None]).reshape(-1)
    n = int(np_prod(shape))
    return flat[:n].reshape(shape)


def _quantize_log(x: jax.Array, block_size: int) -> LogQuantized:
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    pad = (-n) % block_size
    flat = jnp.pad(flat, (0, pad))
    blocks = jnp.maximum(flat.reshape(-1, block_size), 0.0)
    z = jnp.log(blocks + _LOG_TINY)
    # pad lanes (last partial block) must not enter the block stats: a padded
    # zero contributes log(tiny) ≈ -69 to lo, stretching the 255-step log
    # grid over ~60 wasted log-units and destroying relative precision for
    # every REAL v in that block (~13% per requantize at block_size 2048)
    valid = (jnp.arange(flat.shape[0]) < n).reshape(-1, block_size)
    lo = jnp.min(jnp.where(valid, z, jnp.inf), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(valid, z, -jnp.inf), axis=1, keepdims=True)
    scale = jnp.maximum((hi - lo) / 255.0, 1e-12)
    q = jnp.clip(jnp.round((z - lo) / scale), 0, 255).astype(jnp.uint8)
    return LogQuantized(values=q, lo=lo[:, 0], scale=scale[:, 0])


def _dequantize_log(q: LogQuantized, shape) -> jax.Array:
    z = q.values.astype(jnp.float32) * q.scale[:, None] + q.lo[:, None]
    v = jnp.exp(z) - _LOG_TINY
    flat = jnp.maximum(v, 0.0).reshape(-1)
    n = int(np_prod(shape))
    return flat[:n].reshape(shape)


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


class Adam8bitState(NamedTuple):
    count: jax.Array
    # per-leaf moment states in params flattening order; each entry is either
    # a Quantized pair or a plain f32 array
    mu: Tuple[Any, ...]
    nu: Tuple[Any, ...]


def adam8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block_size: int = 2048,
    min_quantize_size: int = 4096,
) -> optax.GradientTransformation:
    """Adam(W) with int8 block-quantized first/second moments."""

    def quantized_leaf(p) -> bool:
        return p.size >= min_quantize_size

    def init(params):
        leaves = jax.tree.leaves(params)
        mu, nu = [], []
        for p in leaves:
            if quantized_leaf(p):
                mu.append(_quantize(jnp.zeros(p.shape, jnp.float32), block_size))
                nu.append(_quantize_log(jnp.zeros(p.shape, jnp.float32), block_size))
            else:
                mu.append(jnp.zeros(p.shape, jnp.float32))
                nu.append(jnp.zeros(p.shape, jnp.float32))
        return Adam8bitState(count=jnp.zeros((), jnp.int32),
                             mu=tuple(mu), nu=tuple(nu))

    def update(grads, state: Adam8bitState, params=None):
        if params is None:
            raise ValueError("adam8bit requires params (for dtype/weight decay)")
        count = state.count + 1
        cf = count.astype(jnp.float32)
        b1t = 1.0 - b1 ** cf
        b2t = 1.0 - b2 ** cf
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        g_leaves, treedef = jax.tree.flatten(grads)
        p_leaves = jax.tree.leaves(params)
        new_updates, new_mu, new_nu = [], [], []
        for g, p, m_s, v_s in zip(g_leaves, p_leaves, state.mu, state.nu):
            g = g.astype(jnp.float32)
            quant = isinstance(m_s, Quantized)
            m = _dequantize(m_s, g.shape) if quant else m_s
            v = _dequantize_log(v_s, g.shape) if quant else v_s
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            step = (m / b1t) / (jnp.sqrt(v / b2t) + eps)
            if weight_decay:
                step = step + weight_decay * p.astype(jnp.float32)
            new_updates.append((-lr * step).astype(p.dtype))
            new_mu.append(_quantize(m, block_size) if quant else m)
            new_nu.append(_quantize_log(v, block_size) if quant else v)
        updates = jax.tree.unflatten(treedef, new_updates)
        return updates, Adam8bitState(count=count, mu=tuple(new_mu), nu=tuple(new_nu))

    return optax.GradientTransformation(init, update)


def state_nbytes(state: Adam8bitState) -> int:
    """Total bytes of optimizer moment state (for memory accounting)."""
    total = 0
    for leaf in jax.tree.leaves((state.mu, state.nu)):
        total += leaf.size * leaf.dtype.itemsize
    return total

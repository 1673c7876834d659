"""Parameter initializers matching PyTorch defaults.

The reference trains from torch default inits (kaiming_uniform(a=√5) for convs
and linears) plus explicit kaiming_uniform(relu) for the C3D U-Net
(c3d.py:127-142); reproducing them keeps training dynamics comparable.

Conv kernels are (kd, kh, kw, Cin, Cout) → fan_in = kd*kh*kw*Cin.
Linear kernels are (in, out) → fan_in = in.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in(shape) -> int:
    if len(shape) == 2:  # linear (in, out)
        return shape[0]
    if len(shape) >= 3:  # conv (spatial..., Cin, Cout)
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        return receptive * shape[-2]
    raise ValueError(f"unsupported param shape {shape}")


def kaiming_uniform(a: float = math.sqrt(5.0)):
    """torch.nn.init.kaiming_uniform_ with slope ``a``, fan_in mode."""

    def init(key, shape, dtype=jnp.float32):
        fan = _fan_in(shape)
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform_relu():
    """torch kaiming_uniform_(mode='fan_in', nonlinearity='relu')."""

    def init(key, shape, dtype=jnp.float32):
        fan = _fan_in(shape)
        bound = math.sqrt(2.0) * math.sqrt(3.0 / fan)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias(weight_shape):
    """torch default bias init: U(-1/√fan_in, 1/√fan_in) of the weight."""
    fan = _fan_in(weight_shape)
    bound = 1.0 / math.sqrt(fan) if fan > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal(std: float = 0.02):
    """Truncated normal (±2σ), used for ViT position embeddings."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)

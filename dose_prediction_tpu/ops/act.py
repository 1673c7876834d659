"""Activation functions (VPU element-wise; fused into conv epilogues by XLA)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def mish(x: jax.Array) -> jax.Array:
    """x * tanh(softplus(x)) — the DOSE-PYFER activation (act='mish',
    train_light_pyfer.py:294). Computed in f32 for a stable softplus."""
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching torch.nn.GELU default in the ViT MLP."""
    return jax.nn.gelu(x, approximate=False)


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, alpha * x)


sigmoid = jax.nn.sigmoid
tanh = jnp.tanh
softplus = jax.nn.softplus


_ACTS = {
    "relu": relu,
    "leakyrelu": leaky_relu,
    "mish": mish,
    "gelu": gelu,
    "sigmoid": sigmoid,
    "tanh": tanh,
    "identity": lambda x: x,
    "none": lambda x: x,
}


def get_act(name: str):
    """Resolve an activation by name ('relu' | 'mish' | 'leakyrelu' | ...)."""
    try:
        return _ACTS[name.lower()]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; options: {sorted(_ACTS)}") from None

"""Normalization primitives for NDHWC volumes with PyTorch-parity semantics.

All statistics use biased variance (PyTorch normalization convention) and are
computed in float32 regardless of activation dtype; XLA fuses the normalize +
scale + activation chain into the surrounding convolution epilogue on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(
    x: jax.Array,
    scale: jax.Array | None = None,
    bias: jax.Array | None = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """InstanceNorm3d: normalize each (sample, channel) over spatial dims.

    Matches nn.InstanceNorm3d (reference c3d.py:17 with affine, and the
    affine-free instances inside conv_3_1 / DualDilatedBlock,
    OARSegmentation/Models/Nets/blocks_MDUNet.py:69,138).

    Args:
        x: ``(N, D, H, W, C)``.
        scale/bias: optional ``(C,)`` affine parameters.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    *,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """BatchNorm3d over (N, D, H, W) per channel, torch running-stat updates.

    Returns ``(y, new_running_mean, new_running_var)``. In torch the running
    variance update uses the *unbiased* batch variance while normalization uses
    the biased one; both behaviors are reproduced (reference conv_block_7,
    blocks_MDUNet.py:103 uses BatchNorm3d inside the k=7 multi-scale branch).
    """
    xf = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(xf, axis=(0, 1, 2, 3))
        var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2, 3))
        n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
        unbiased = var * (n / max(n - 1, 1))
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean.astype(jnp.float32), running_var.astype(jnp.float32)
        new_mean, new_var = running_mean, running_var
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), new_mean, new_var


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the trailing feature axis (ViT transformer blocks)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def group_norm(
    x: jax.Array,
    scale: jax.Array | None,
    bias: jax.Array | None,
    *,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over (spatial, channels-in-group), NDHWC."""
    n, d, h, w, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    xf = x.astype(jnp.float32).reshape(n, d, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3, 5), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, d, h, w, c)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)

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


def reinit_weights(params, key, *, init_type: str = "normal",
                   init_gain: float = 0.02):
    """Re-initialize a param tree the pix2pix way (init_weights,
    train_light_gan.py:29-59, applied to both GAN nets at :145-146):
    'normal' | 'xavier' | 'kaiming' | 'orthogonal' on conv/linear kernels,
    biases to 0, norm scales to N(1, gain) with biases 0.

    Path-based analogue of the torch module-class walk: leaves named 'kernel'
    with ndim ≥ 2 are conv/linear weights; 'scale' leaves are norm affine
    weights (the reference touches only BatchNorm3d scales — here every norm
    scale qualifies, the models this is used on are BatchNorm-based)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves_with_path, treedef = flat
    keys = jax.random.split(key, max(len(leaves_with_path), 1))

    def fan_in_out(shape):
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        return shape[-2] * receptive, shape[-1] * receptive

    def init_kernel(k, leaf):
        shape = leaf.shape
        fin, fout = fan_in_out(shape)
        if init_type == "normal":
            return init_gain * jax.random.normal(k, shape, leaf.dtype)
        if init_type == "xavier":
            std = init_gain * math.sqrt(2.0 / (fin + fout))
            return std * jax.random.normal(k, shape, leaf.dtype)
        if init_type == "kaiming":
            std = math.sqrt(2.0 / fin)     # a=0, fan_in, relu gain
            return std * jax.random.normal(k, shape, leaf.dtype)
        if init_type == "orthogonal":
            flat_shape = (int(jnp.prod(jnp.asarray(shape[:-1]))), shape[-1])
            a = jax.random.normal(k, flat_shape, jnp.float32)
            q, r = jnp.linalg.qr(a if flat_shape[0] >= flat_shape[1] else a.T)
            q = q * jnp.sign(jnp.diag(r))[None, :]
            if flat_shape[0] < flat_shape[1]:
                q = q.T
            return (init_gain * q.reshape(shape)).astype(leaf.dtype)
        raise NotImplementedError(f"init type {init_type!r}")

    out = []
    for (path, leaf), k in zip(leaves_with_path, keys):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "kernel" and leaf.ndim >= 2:
            out.append(init_kernel(k, leaf))
        elif name == "bias":
            out.append(jnp.zeros_like(leaf))
        elif name == "scale":
            out.append(1.0 + init_gain * jax.random.normal(k, leaf.shape, leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)

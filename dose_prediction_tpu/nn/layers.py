"""Thin flax.linen wrappers over the TPU ops with torch-parity defaults.

These are the leaf layers every block/model is built from. Conventions:
- activations flow in ``dtype`` (bfloat16 for TPU training), params in float32;
- conv kernels are (kd, kh, kw, Cin, Cout); inputs NDHWC;
- ``Conv3D(torch_init=True)`` reproduces nn.Conv3d's default
  kaiming_uniform(a=√5) + uniform bias.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from dose_prediction_tpu import ops
from dose_prediction_tpu.nn import init as tinit

IntOr3 = Union[int, Sequence[int]]
Dtype = Any


class Conv3D(fnn.Module):
    features: int
    kernel_size: IntOr3 = 3
    stride: IntOr3 = 1
    padding: IntOr3 = 0
    dilation: IntOr3 = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (self.kernel_size,) * 3
        cin = x.shape[-1]
        wshape = (*k, cin, self.features)
        kinit = self.kernel_init or tinit.kaiming_uniform()
        w = self.param("kernel", kinit, wshape)
        b = self.param("bias", tinit.torch_bias(wshape), (self.features,)) if self.use_bias else None
        return ops.conv3d(
            x.astype(self.dtype),
            w.astype(self.dtype),
            None if b is None else b,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
        )


class ConvTranspose3D(fnn.Module):
    features: int
    kernel_size: IntOr3 = 2
    stride: IntOr3 = 2
    padding: IntOr3 = 0
    output_padding: IntOr3 = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (self.kernel_size,) * 3
        cin = x.shape[-1]
        wshape = (*k, cin, self.features)
        # torch ConvTranspose3d fan_in for init purposes uses Cout * prod(k)
        # via its (Cin, Cout, k...) layout; replicate by computing the bound on
        # the transposed layout.
        fan = self.features * int(math.prod(k))
        gain = math.sqrt(2.0 / 6.0)
        bound = gain * math.sqrt(3.0 / fan)

        def kinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("kernel", kinit, wshape)
        b = None
        if self.use_bias:
            bb = 1.0 / math.sqrt(fan)
            b = self.param(
                "bias", lambda key, s, d=jnp.float32: jax.random.uniform(key, s, d, -bb, bb), (self.features,)
            )
        return ops.conv_transpose3d(
            x.astype(self.dtype),
            w.astype(self.dtype),
            b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class InstanceNorm(fnn.Module):
    """InstanceNorm3d; ``affine`` matches the torch flag at each usage site."""

    affine: bool = True
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", tinit.ones, (c,)) if self.affine else None
        bias = self.param("bias", tinit.zeros, (c,)) if self.affine else None
        from dose_prediction_tpu.core.config import FLAGS

        # wide-channel volumes route through the fused Pallas kernel
        # (2 reads + 1 write of HBM); narrow ones stay on XLA, which wins
        # below the 128-lane register width (docs/PERFORMANCE.md)
        n_spatial = int(np.prod(x.shape[1:-1])) if x.ndim == 5 else 0
        if x.ndim == 5 and FLAGS.pallas_instance_norm_for(c, n_spatial):
            from dose_prediction_tpu.kernels.instance_norm import instance_norm_act

            return instance_norm_act(
                x,
                scale if scale is not None else jnp.ones((c,), jnp.float32),
                bias if bias is not None else jnp.zeros((c,), jnp.float32),
                eps=self.eps)
        return ops.instance_norm(x, scale, bias, eps=self.eps)


class BatchNorm(fnn.Module):
    """BatchNorm3d with torch running-stat semantics (momentum 0.1).

    Running statistics live in the ``batch_stats`` collection; pass
    ``use_running_average=True`` for eval.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x, use_running_average: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", tinit.ones, (c,))
        bias = self.param("bias", tinit.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        y, new_mean, new_var = ops.batch_norm(
            x,
            scale,
            bias,
            ra_mean.value,
            ra_var.value,
            training=not use_running_average,
            momentum=self.momentum,
            eps=self.eps,
        )
        if not use_running_average and not self.is_initializing():
            ra_mean.value = new_mean
            ra_var.value = new_var
        return y


class LayerNorm(fnn.Module):
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", tinit.ones, (c,))
        bias = self.param("bias", tinit.zeros, (c,))
        return ops.layer_norm(x, scale, bias, eps=self.eps)


class Dense(fnn.Module):
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        wshape = (cin, self.features)
        kinit = self.kernel_init or tinit.kaiming_uniform()
        w = self.param("kernel", kinit, wshape)
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype), preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", tinit.torch_bias(wshape), (self.features,))
            y = y + b
        return y.astype(self.dtype)


def make_norm(norm: str, affine: bool = True) -> fnn.Module:
    """Norm factory mirroring MONAI's norm_name resolution ('instance'/'batch')."""
    norm = norm.lower()
    if norm == "instance":
        return InstanceNorm(affine=affine)
    if norm == "batch":
        return BatchNorm()
    raise ValueError(f"unknown norm {norm!r}")

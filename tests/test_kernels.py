"""Pallas kernel parity tests (interpret mode on CPU) against the XLA ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu import ops
from dose_prediction_tpu.kernels.attention import fused_attention, xla_attention
from dose_prediction_tpu.kernels.instance_norm import instance_norm_act


@pytest.mark.parametrize("act", ["identity", "relu", "mish"])
def test_instance_norm_act_matches_ops(rng, act):
    x = rng.standard_normal((2, 4, 4, 8, 16)).astype(np.float32) * 2 + 1
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(instance_norm_act(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), act=act, interpret=True))
    want = np.asarray(ops.get_act(act)(
        ops.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_instance_norm_act_grad_matches_reference(rng):
    x = rng.standard_normal((1, 4, 4, 4, 8)).astype(np.float32)
    scale = np.ones(8, np.float32)
    bias = np.zeros(8, np.float32)

    def f_kernel(x):
        return jnp.sum(instance_norm_act(x, jnp.asarray(scale), jnp.asarray(bias),
                                         act="mish", interpret=True) ** 2)

    def f_ref(x):
        return jnp.sum(ops.mish(ops.instance_norm(x, jnp.asarray(scale), jnp.asarray(bias))) ** 2)

    g_kernel = np.asarray(jax.grad(f_kernel)(jnp.asarray(x)))
    g_ref = np.asarray(jax.grad(f_ref)(jnp.asarray(x)))
    np.testing.assert_allclose(g_kernel, g_ref, rtol=1e-4, atol=1e-4)


def test_fused_attention_matches_xla(rng):
    q = rng.standard_normal((2, 3, 64, 16)).astype(np.float32)
    k = rng.standard_normal((2, 3, 64, 16)).astype(np.float32)
    v = rng.standard_normal((2, 3, 64, 16)).astype(np.float32)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     interpret=True))
    want = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_attention_grad(rng):
    q = rng.standard_normal((1, 2, 32, 8)).astype(np.float32)
    k = rng.standard_normal((1, 2, 32, 8)).astype(np.float32)
    v = rng.standard_normal((1, 2, 32, 8)).astype(np.float32)

    def f(q, k, v):
        return jnp.sum(fused_attention(q, k, v, interpret=True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fused_attention_long_sequence_falls_back(rng):
    q = rng.standard_normal((1, 1, 2048, 8)).astype(np.float32)
    out = fused_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q))
    assert out.shape == (1, 1, 2048, 8)


# ---------------------------------------------------------------------------
# Pallas direct k3 conv (kernels/conv3d.py)
# ---------------------------------------------------------------------------

def test_pallas_conv3d_k3_matches_xla(rng):
    from dose_prediction_tpu.kernels.conv3d import conv3d_k3
    from dose_prediction_tpu.ops.conv import conv3d

    for shape, cout in [((1, 8, 8, 16, 16), 16), ((1, 8, 8, 8, 32), 32),
                        ((2, 4, 8, 16, 16), 16)]:
        cin = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
        ref = conv3d(x, w, b, padding=1, method="xla")
        got = conv3d_k3(x, w, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_conv3d_k3_grad(rng):
    from dose_prediction_tpu.kernels.conv3d import conv3d_k3
    from dose_prediction_tpu.ops.conv import conv3d

    x = jnp.asarray(rng.standard_normal((1, 4, 8, 16, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 16)).astype(np.float32) * 0.2)
    g1 = jax.grad(lambda w_: jnp.sum(jnp.sin(
        conv3d(x, w_, None, padding=1, method="xla"))))(w)
    g2 = jax.grad(lambda w_: jnp.sum(jnp.sin(conv3d_k3(x, w_, None, interpret=True))))(w)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-3, atol=2e-4)


def test_conv3d_pallas_routing_matches_decomposed(rng):
    """ops.conv3d(method='pallas') routes eligible k3 convs through the
    Pallas kernel (interpret mode off-TPU) with exact-path parity; ineligible
    shapes fall back to the standard paths."""
    from dose_prediction_tpu.ops.conv import conv3d

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 3, 16, 16)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
    ref = conv3d(x, w, b, padding=1, method="decomposed")
    got = conv3d(x, w, b, padding=1, method="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # ineligible (stride 2) → falls back, still correct
    got2 = conv3d(x, w, b, padding=1, stride=2, method="pallas")
    ref2 = conv3d(x, w, b, padding=1, stride=2, method="auto")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=1e-5, atol=1e-5)

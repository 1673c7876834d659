"""Golden parity tests for core 3D ops against torch CPU references.

The PyTorch reference delegates all math to torch/cuDNN; these tests pin our
NDHWC TPU primitives to the exact same numerics (within fp32 tolerance).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dose_prediction_tpu import ops


def _to_torch(x_ndhwc):
    # NDHWC -> NCDHW
    return torch.from_numpy(np.transpose(x_ndhwc, (0, 4, 1, 2, 3)).copy())


def _from_torch(t):
    # NCDHW -> NDHWC
    return np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))


@pytest.mark.parametrize(
    "k,stride,padding,dilation",
    [
        (3, 1, 1, 1),
        (3, 2, 1, 1),
        (1, 1, 0, 1),
        (7, 1, 3, 1),
        (5, 1, 2, 1),
        (3, 1, 2, 2),
        (3, 1, 3, 3),
        (2, 1, 0, 1),
        (2, 1, 1, 1),
    ],
)
def test_conv3d_matches_torch(rng, k, stride, padding, dilation):
    n, d, cin, cout = 2, 12, 3, 5
    x = rng.standard_normal((n, d, d, d, cin), dtype=np.float32)
    w = rng.standard_normal((k, k, k, cin, cout), dtype=np.float32) * 0.2
    b = rng.standard_normal(cout).astype(np.float32)

    got = np.asarray(
        ops.conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                   stride=stride, padding=padding, dilation=dilation)
    )
    # torch weight layout: (Cout, Cin, kd, kh, kw)
    wt = torch.from_numpy(np.transpose(w, (4, 3, 0, 1, 2)).copy())
    want = _from_torch(
        F.conv3d(_to_torch(x), wt, torch.from_numpy(b), stride=stride,
                 padding=padding, dilation=dilation)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "cin,cout,dilation",
    [(16, 16, 1), (16, 32, 1), (8, 16, 2), (4, 4, 3), (64, 64, 1), (3, 5, 1)],
)
def test_conv3d_lanefold_matches_xla(rng, cin, cout, dilation):
    """Lane-folded k3 matmuls (MXU 128-lane packing) == the rank-5 XLA conv,
    forward and gradient."""
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 16, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    ref = ops.conv3d(x, w, b, padding=dilation, dilation=dilation, method="xla")
    got = ops.conv3d(x, w, b, padding=dilation, dilation=dilation, method="lanefold")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    import jax

    def loss(method):
        return lambda w_: jnp.sum(jnp.tanh(
            ops.conv3d(x, w_, None, padding=dilation, dilation=dilation, method=method)))

    g_ref = jax.grad(loss("xla"))(w)
    g_got = jax.grad(loss("lanefold"))(w)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize(
    "k,stride,padding,dilation",
    [(7, 1, 3, 1), (5, 2, 2, 1), (3, 1, 2, 2), (3, 2, 3, 3), (7, 2, 3, 1)],
)
def test_conv3d_decomposed_matches_xla(rng, k, stride, padding, dilation):
    """The depth-decomposed conv path is exactly the rank-5 XLA conv."""
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 12, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, k, 6, 4)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    ref = ops.conv3d(x, w, b, stride=stride, padding=padding, dilation=dilation,
                     method="xla")
    dec = ops.conv3d(x, w, b, stride=stride, padding=padding, dilation=dilation,
                     method="decomposed")
    np.testing.assert_allclose(np.asarray(dec), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k,stride,padding", [(2, 2, 0), (4, 2, 1), (3, 1, 1), (2, 2, 0)])
def test_conv_transpose3d_matches_torch(rng, k, stride, padding):
    n, d, cin, cout = 1, 8, 4, 3
    x = rng.standard_normal((n, d, d, d, cin), dtype=np.float32)
    w = rng.standard_normal((k, k, k, cin, cout), dtype=np.float32) * 0.2
    b = rng.standard_normal(cout).astype(np.float32)

    got = np.asarray(
        ops.conv_transpose3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             stride=stride, padding=padding)
    )
    # torch transposed-conv weight layout: (Cin, Cout, kd, kh, kw)
    wt = torch.from_numpy(np.transpose(w, (3, 4, 0, 1, 2)).copy())
    want = _from_torch(
        F.conv_transpose3d(_to_torch(x), wt, torch.from_numpy(b),
                           stride=stride, padding=padding)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("affine", [True, False])
def test_instance_norm_matches_torch(rng, affine):
    n, d, c = 2, 10, 6
    x = rng.standard_normal((n, d, d, d, c), dtype=np.float32) * 3 + 1
    scale = rng.standard_normal(c).astype(np.float32) if affine else None
    bias = rng.standard_normal(c).astype(np.float32) if affine else None

    got = np.asarray(ops.instance_norm(
        jnp.asarray(x),
        None if scale is None else jnp.asarray(scale),
        None if bias is None else jnp.asarray(bias),
    ))
    m = torch.nn.InstanceNorm3d(c, affine=affine)
    if affine:
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(scale))
            m.bias.copy_(torch.from_numpy(bias))
    want = _from_torch(m(_to_torch(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_batch_norm_matches_torch_train_and_eval(rng):
    n, d, c = 4, 6, 5
    x = rng.standard_normal((n, d, d, d, c), dtype=np.float32) * 2 + 0.5
    scale = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    rmean = np.zeros(c, np.float32)
    rvar = np.ones(c, np.float32)

    m = torch.nn.BatchNorm3d(c)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(scale))
        m.bias.copy_(torch.from_numpy(bias))

    # train mode
    got, new_mean, new_var = ops.batch_norm(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(rmean), jnp.asarray(rvar), training=True)
    m.train()
    want = _from_torch(m(_to_torch(x)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_mean), m.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_var), m.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval mode with the updated stats
    got_eval, _, _ = ops.batch_norm(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        new_mean, new_var, training=False)
    m.eval()
    want_eval = _from_torch(m(_to_torch(x)))
    np.testing.assert_allclose(np.asarray(got_eval), want_eval, rtol=1e-4, atol=1e-4)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 512, 96), dtype=np.float32)
    scale = rng.standard_normal(96).astype(np.float32)
    bias = rng.standard_normal(96).astype(np.float32)
    got = np.asarray(ops.layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    want = F.layer_norm(torch.from_numpy(x), (96,), torch.from_numpy(scale),
                        torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "mode,align,out",
    [
        ("trilinear", True, (16, 16, 16)),
        ("trilinear", True, (4, 4, 4)),
        ("trilinear", False, (16, 16, 16)),
        ("trilinear", False, (5, 7, 3)),
        ("nearest", False, (16, 16, 16)),
        ("nearest-exact", False, (4, 4, 4)),
        ("nearest-exact", False, (3, 5, 7)),
    ],
)
def test_resize3d_matches_torch(rng, mode, align, out):
    x = rng.standard_normal((2, 8, 8, 8, 3), dtype=np.float32)
    kwargs = {"align_corners": align} if mode == "trilinear" else {}
    want = _from_torch(F.interpolate(_to_torch(x), size=out, mode=mode, **kwargs))
    got = np.asarray(ops.resize3d(jnp.asarray(x), out, mode=mode, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_max_pool3d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 8, 4), dtype=np.float32)
    got = np.asarray(ops.max_pool3d(jnp.asarray(x), 2))
    want = _from_torch(F.max_pool3d(_to_torch(x), 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mish_matches_torch(rng):
    x = rng.standard_normal((4, 128), dtype=np.float32) * 5
    got = np.asarray(ops.mish(jnp.asarray(x)))
    want = F.mish(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gelu_matches_torch(rng):
    x = rng.standard_normal((4, 128), dtype=np.float32) * 3
    got = np.asarray(ops.gelu(jnp.asarray(x)))
    want = F.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

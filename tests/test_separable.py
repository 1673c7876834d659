"""Separable-k7 TranSeg decoder variant (VERDICT r4 next-round #3: the
structural attack on the measured seg-sweep k7 ceiling) + its dense→separable
warm-start shim (nn/separable.py)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dose_prediction_tpu.nn import separable as SP
from dose_prediction_tpu.nn.mdunet import Conv31
from dose_prediction_tpu.models import TranSeg


def _small_transeg(**kw):
    return TranSeg(out_ch=4, feature_size=4, hidden_size=24, mlp_dim=48,
                   num_layers=4, num_heads=2, **kw)


def _rank1_kernel(rng, k, ci, co):
    A = rng.normal(size=(k, ci, co))
    b = rng.normal(size=k)
    c = rng.normal(size=k)
    return np.einsum("dio,h,w->dhwio", A, b, c).astype(np.float32)


def test_project_dense_kernel_exact_on_rank1():
    rng = np.random.default_rng(0)
    K = _rank1_kernel(rng, 7, 6, 5)
    A, B, C, err = SP.project_dense_kernel(K)
    assert err < 1e-6
    assert A.shape == (7, 1, 1, 6, 5)
    assert B.shape == (1, 7, 1, 5, 5) and C.shape == (1, 1, 7, 5, 5)
    # B/C are channel-diagonal spatial profiles
    offdiag = B[0, :, 0] * (1 - np.eye(5))
    assert np.abs(offdiag).max() == 0.0


def test_project_dense_kernel_is_best_shared_profile_fit():
    """On a random (full-rank) kernel the residual equals the optimal
    projection residual given the chosen profiles — recomputing A from the
    returned profiles changes nothing (self-consistency)."""
    rng = np.random.default_rng(1)
    K = rng.normal(size=(7, 7, 7, 3, 4)).astype(np.float32)
    A, B, C, err = SP.project_dense_kernel(K)
    b = B[0, :, 0, 0, 0] / np.linalg.norm(B[0, :, 0, 0, 0])
    c = C[0, 0, :, 0, 0] / np.linalg.norm(C[0, 0, :, 0, 0])
    A2 = np.einsum("dhwio,h,w->dio", K.astype(np.float64), b, c)
    approx = np.einsum("dio,h,w->dhwio", A2, b, c)
    err2 = np.linalg.norm(K - approx) / np.linalg.norm(K)
    assert err == pytest.approx(err2, rel=1e-5)
    assert 0 < err < 1  # random kernels are not separable; err is honest


def test_conv31_separable_chain_matches_dense_on_rank1_kernels():
    """The 1-D chain with per-axis 'same' zero padding composes EXACTLY to a
    dense conv with kernel A⊗b⊗c (cross-axis padding tails never interact) —
    so on a rank-1 dense checkpoint the shim is numerically exact end to end
    through the norms and activations."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 12, 6)), jnp.float32)

    dense = Conv31(8, family="seg")
    vd = dense.init(jax.random.PRNGKey(0), x)
    # overwrite every k7 kernel with an exactly-separable tensor
    params = jax.tree.map(np.asarray, vd["params"])
    for i in range(2):
        ker = params["branch7"][f"conv{i}"]["kernel"]
        params["branch7"][f"conv{i}"]["kernel"] = _rank1_kernel(
            rng, 7, ker.shape[3], ker.shape[4])
    vd = {**vd, "params": params}

    sep = Conv31(8, family="seg", k7_mode="separable")
    vs_tpl = sep.init(jax.random.PRNGKey(1), x)
    vs, errors = SP.separabilize_variables(
        jax.tree.map(np.asarray, vd), jax.tree.map(np.asarray, vs_tpl))
    assert all(e < 1e-5 for e in errors.values()), errors

    out_d, _ = dense.apply(vd, x, False, mutable=["batch_stats"])
    out_s, _ = sep.apply(vs, x, False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=2e-4)


def test_transeg_separable_forward_and_param_tree():
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    model = _small_transeg(k7_mode="separable")
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = {"/".join(str(k.key) for k in path) for path, _ in flat}
    assert any("conv0_d" in n for n in names)
    assert not any(n.endswith("branch7/conv0/kernel") for n in names)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False,
                                           mutable=["batch_stats"])[0])(variables, x)
    assert out.shape == (1, 32, 32, 32, 4)
    # the default stays dense — reference parity untouched
    vd = jax.jit(_small_transeg().init)(jax.random.PRNGKey(0), x)
    dflat = jax.tree_util.tree_leaves_with_path(vd["params"])
    dnames = {"/".join(str(k.key) for k in path) for path, _ in dflat}
    assert any(n.endswith("branch7/conv0/kernel") for n in dnames)
    assert not any("conv0_d" in n for n in dnames)


def test_transeg_shim_end_to_end_outputs_same_shape_and_finite():
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, 32, 32, 32, 1)), jnp.float32)
    dense = _small_transeg()
    vd = jax.jit(dense.init)(jax.random.PRNGKey(0), x)
    sep = _small_transeg(k7_mode="separable")
    vs_tpl = jax.jit(sep.init)(jax.random.PRNGKey(1), x)
    vs, errors = SP.separabilize_variables(
        jax.tree.map(np.asarray, vd), jax.tree.map(np.asarray, vs_tpl))
    assert len(errors) == 8  # 4 decoder stages × 2 k7 convs each
    assert all(0 <= e <= 1.0001 for e in errors.values())
    out, _ = sep.apply(vs, x, train=False, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()


def test_separable_flops_are_much_lower():
    """The point of the variant: count conv-kernel tap·channel products in
    both param trees (a proxy for per-voxel FLOPs of the k7 branches)."""
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)

    def branch7_cost(variables):
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        return sum(int(np.prod(leaf.shape)) for path, leaf in flat
                   if "branch7" in "/".join(str(k.key) for k in path)
                   and "kernel" in str(path[-1].key))

    dense_cost = branch7_cost(jax.jit(_small_transeg().init)(
        jax.random.PRNGKey(0), x))
    sep_cost = branch7_cost(jax.jit(
        _small_transeg(k7_mode="separable").init)(jax.random.PRNGKey(0), x))
    assert sep_cost < dense_cost / 8


@pytest.mark.slow
def test_cli_train_separable_transeg(tmp_path):
    from dose_prediction_tpu.cli.main import main
    from dose_prediction_tpu.data.synthetic import make_synthetic_dataset

    pattern = make_synthetic_dataset(tmp_path / "d", n_patients=1)
    rc = main(["train", "transeg", "--data", pattern, "--epochs", "1",
               "--max-steps", "1", "--model-size", "small", "--roi", "16",
               "--k7-mode", "separable",
               "--ckpt-dir", str(tmp_path / "ck"),
               "--log-dir", str(tmp_path / "lg")])
    assert rc == 0
    rc = main(["seg-eval", "--data", pattern, "--ckpt",
               str(tmp_path / "ck" / "last"), "--model-size", "small",
               "--roi", "16", "--k7-mode", "separable",
               "--ckpt-dir", str(tmp_path / "ck2"),
               "--log-dir", str(tmp_path / "lg2")])
    assert rc == 0


def test_linked_model_builds_seg_with_k7_mode(monkeypatch):
    """Round-5 review finding: linked-eval's --k7-mode was dead for full-size
    models — LinkedModel's default TranSeg construction dropped it, so a
    separable-trained seg checkpoint (conv0_d/_h/_w param trees) hit a dense
    module. LinkedModel must thread seg_k7_mode into both default paths."""
    from dose_prediction_tpu.train import linked as L

    captured = {}

    def fake_cascade(seg_model, seg_vars, dose_model, dose_vars, **kw):
        captured["seg_model"] = seg_model
        return lambda *a: None

    monkeypatch.setattr(L, "make_cascade_fn", fake_cascade)
    for seg_mode in ("sliding", "dense"):
        m = L.LinkedModel(seg_variables={}, dose_variables={},
                          seg_mode=seg_mode, seg_k7_mode="separable")
        assert m.seg_model.k7_mode == "separable", seg_mode
        assert captured["seg_model"] is m.seg_model

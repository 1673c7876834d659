"""Tests: train steps descend, freeze masks hold, checkpoint surgery, the
sliding-window engine, and the linked cascade program."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dose_prediction_tpu.core import checkpoint as C
from dose_prediction_tpu.infer.cascade import make_cascade_fn
from dose_prediction_tpu.infer.sliding_window import (
    make_sliding_window_fn,
    sliding_window_inference,
    window_grid,
)
from dose_prediction_tpu.models import BaseUNet, CascadeC3D, DosePyfer, TranSeg
from dose_prediction_tpu.train import state as S
from dose_prediction_tpu.train.steps import (
    make_cascade_c3d_train_step,
    make_pyfer_eval_step,
    make_pyfer_train_step,
    make_transeg_train_step,
)

SMALL_PYFER = dict(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                   hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)


def _dose_batch(rng, size=32):
    inp = rng.standard_normal((1, size, size, size, 9)).astype(np.float32)
    dose = np.abs(rng.standard_normal((1, size, size, size, 1))).astype(np.float32)
    mask = (rng.random((1, size, size, size, 1)) < 0.5).astype(np.float32)
    return {"input": jnp.asarray(inp), "gt": jnp.asarray(np.concatenate([dose, mask], -1))}


@pytest.mark.slow
def test_pyfer_train_step_descends_and_freezes(rng):
    model = DosePyfer(**SMALL_PYFER)
    batch = _dose_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["input"])
    labels = S.cascade_freeze_labels(variables["params"])
    tx = S.make_optimizer(learning_rate=1e-3, weight_decay=1e-4, freeze_labels=labels)
    state = S.create_train_state(variables, tx)
    step = make_pyfer_train_step(model, tx, freeze=True, donate=False)

    frozen_before = jax.tree.map(lambda x: x.copy(), state.params["net_A"])
    losses = []
    for _ in range(3):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # frozen subtree unchanged
    for a, b in zip(jax.tree.leaves(frozen_before), jax.tree.leaves(state.params["net_A"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainable subtree changed
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(variables["params"]["net_B"]),
                        jax.tree.leaves(state.params["net_B"]))
    )
    assert changed
    assert np.isfinite(float(state.moving_loss))


def test_pyfer_eval_step(rng):
    model = DosePyfer(**SMALL_PYFER)
    batch = _dose_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["input"])
    tx = S.make_optimizer(learning_rate=1e-3)
    state = S.create_train_state(variables, tx)
    out = make_pyfer_eval_step(model)(state, batch)
    assert np.isfinite(float(out["val_loss"]))
    assert np.isfinite(float(out["dose_score"]))
    pred = np.asarray(out["prediction"])
    mask = np.asarray(batch["gt"][..., 1:2])
    assert (pred[mask < 1] == 0).all() and (pred >= 0).all()


def test_c3d_cascade_step(rng):
    model = CascadeC3D(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32),
                       list_ch_B=(-1, 2, 4, 8, 16, 32))
    batch = _dose_batch(rng, size=16)
    variables = model.init(jax.random.PRNGKey(0), batch["input"])
    tx = S.make_optimizer(learning_rate=1e-3)
    state = S.create_train_state(variables, tx)
    step = make_cascade_c3d_train_step(model, tx)
    l0 = None
    for _ in range(3):
        state, loss = step(state, batch)
        l0 = l0 if l0 is not None else float(loss)
    assert float(loss) < l0


@pytest.mark.slow
def test_transeg_step(rng):
    model = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                    num_layers=4, num_heads=2)
    ct = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 1)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 8, (2, 32, 32, 32)))
    variables = model.init(jax.random.PRNGKey(0), ct)
    tx = S.make_optimizer(learning_rate=1e-3)
    state = S.create_train_state(variables, tx)
    step = make_transeg_train_step(model, tx)
    state, loss1 = step(state, {"ct": ct, "labels": labels})
    state, loss2 = step(state, {"ct": ct, "labels": labels})
    assert float(loss2) < float(loss1)


def test_schedules():
    ms = S.multistep_schedule(1.0, [10, 20], 0.1)
    assert float(ms(5)) == pytest.approx(1.0)
    assert float(ms(15)) == pytest.approx(0.1)
    assert float(ms(25)) == pytest.approx(0.01, rel=1e-5)
    cs = S.cosine_schedule(1.0, 100)
    assert float(cs(0)) == pytest.approx(1.0)
    assert float(cs(100)) == pytest.approx(0.0, abs=1e-6)
    pl = S.ReduceLROnPlateau(factor=0.5, patience=1, base_lr=1.0)
    for v in [1.0, 1.0, 1.0, 1.0]:
        lr = pl.step(v)
    assert lr < 1.0


def test_weight_surgery_net_a(rng):
    small = dict(list_ch_A=(-1, 2, 4, 8, 16, 32), list_ch_B=(-1, 2, 4, 8, 16, 32))
    c3d = CascadeC3D(out_ch=1, **small)
    x = jnp.zeros((1, 16, 16, 16, 9))
    c3d_params = c3d.init(jax.random.PRNGKey(1), x)["params"]
    pyfer = DosePyfer(**SMALL_PYFER)
    pyfer_vars = pyfer.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 32, 9)))
    merged, stats = C.load_pretrained_net_a(pyfer_vars["params"], c3d_params, verbose=False)
    # net_A subtree copied exactly
    for a, b in zip(jax.tree.leaves(merged["net_A"]), jax.tree.leaves(c3d_params["net_A"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # net_B untouched
    for a, b in zip(jax.tree.leaves(merged["net_B"]), jax.tree.leaves(pyfer_vars["params"]["net_B"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert stats["copied"] > 0 and stats["unused"] > 0


def test_checkpoint_roundtrip(tmp_path, rng):
    model = BaseUNet(list_ch=(-1, 2, 4, 8, 16, 32))
    x = jnp.zeros((1, 16, 16, 16, 9))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    C.save_checkpoint(tmp_path / "ckpt", {"params": params, "step": 7})
    restored = C.restore_checkpoint(tmp_path / "ckpt")
    assert int(np.asarray(restored["step"])) == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------- sliding window ----------------

def test_window_grid_monai_spacing():
    g = window_grid((128, 128, 128), (96, 96, 96), 0.25)
    # 1D starts: 0 and 32 (last clamped to image-roi)
    zs = sorted({z for z, _, _ in g})
    assert zs == [0, 32]
    assert len(g) == 8
    g2 = window_grid((64, 64, 64), (96, 96, 96), 0.25)
    assert g2 == [(0, 0, 0)]


@pytest.mark.parametrize("mode", ["constant", "gaussian"])
def test_sliding_window_identity(rng, mode):
    """Identity predictor → blended output equals the input exactly."""
    vol = jnp.asarray(rng.standard_normal((1, 24, 20, 28, 3)).astype(np.float32))
    out = sliding_window_inference(vol, lambda w: w, roi_size=(16, 16, 16),
                                   sw_batch_size=3, overlap=0.25, mode=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=2e-5, atol=2e-5)


def test_sliding_window_channel_change(rng):
    vol = jnp.asarray(rng.standard_normal((1, 20, 20, 20, 1)).astype(np.float32))
    run = make_sliding_window_fn(
        lambda w: jnp.concatenate([w, w * 2], axis=-1),
        roi_size=(16, 16, 16), sw_batch_size=2, out_channels=2)
    out = run(vol)
    assert out.shape == (1, 20, 20, 20, 2)
    np.testing.assert_allclose(np.asarray(out[..., 1]), 2 * np.asarray(out[..., 0]), rtol=1e-5)


def test_sliding_window_small_volume_pads(rng):
    vol = jnp.asarray(rng.standard_normal((1, 10, 12, 9, 2)).astype(np.float32))
    out = sliding_window_inference(vol, lambda w: w, roi_size=(16, 16, 16), sw_batch_size=1)
    assert out.shape == vol.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=1e-5)


def test_cascade_program(rng):
    seg = TranSeg(out_ch=8, feature_size=2, hidden_size=24, mlp_dim=48,
                  num_layers=4, num_heads=2)
    dose = DosePyfer(**SMALL_PYFER)
    ct = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32))
    ptv = jnp.asarray((rng.random((1, 32, 32, 32, 1)) < 0.1).astype(np.float32))
    mask = jnp.asarray((rng.random((1, 32, 32, 32, 1)) < 0.7).astype(np.float32))
    seg_vars = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 32, 1)))
    dose_vars = dose.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 32, 9)))
    run = make_cascade_fn(seg, seg_vars, dose, dose_vars,
                          roi_size=(32, 32, 32), sw_batch_size=1)
    out = run(ct, ptv, mask)
    assert out.shape == (1, 32, 32, 32, 1)
    o = np.asarray(out)
    m = np.asarray(mask)
    assert (o[m < 1] == 0).all() and (o >= 0).all()


@pytest.mark.slow
def test_frozen_cascade_stop_gradient_equivalence():
    """stop_gradient at the cascade handoff (freeze=True) must leave the loss
    and every TRAINABLE (net_B) gradient bit-identical — it only removes the
    net_A backward work that the optax freeze mask would zero anyway."""
    import jax
    import jax.numpy as jnp

    from dose_prediction_tpu.models import DosePyfer
    from dose_prediction_tpu.train import losses as L

    model = DosePyfer(out_ch=1, list_ch_A=(-1, 2, 4, 8, 16, 32), feature_size=2,
                      hidden_size=24, mlp_dim=48, num_layers=4, num_heads=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 32, 9)),
                    jnp.float32)
    gt = jnp.concatenate([
        jnp.abs(x[..., :1]), (x[..., 1:2] > 0).astype(jnp.float32)], -1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss_fn(params, stop):
        (pred_a, preds_b), _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            x, train=True, mutable=["batch_stats"], stop_gradient_a=stop)
        return L.gen_loss((pred_a, preds_b), gt, cascade=True, freeze=True)

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, False))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, True))(variables["params"])
    assert float(l0) == float(l1)
    for key in g0:
        if key in ("net_A", "conv_out_A"):
            # with stop_gradient these are exactly zero (previously nonzero
            # but masked by optax.set_to_zero)
            assert all(float(jnp.max(jnp.abs(leaf))) == 0.0
                       for leaf in jax.tree.leaves(g1[key]))
        else:
            for a, b in zip(jax.tree.leaves(g0[key]), jax.tree.leaves(g1[key])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

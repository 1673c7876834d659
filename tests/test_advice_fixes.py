"""Regression tests for the round-2 advisor findings (ADVICE.md):
legacy checkpoint-layout fallback, lr injection through dict optimizer states,
ASHA early-stop accounting, and native/numpy augmentation stream parity."""

import math

import numpy as np
import pytest

import jax.numpy as jnp


def test_set_learning_rate_through_multi_transform_dict():
    """optax.multi_transform stores inner states in a dict; a plateau
    optimizer composed with a freeze mask must still be lr-adjustable."""
    import optax

    from dose_prediction_tpu.train import state as S

    params = {"net_A": {"w": jnp.ones((3,))}, "net_B": {"w": jnp.ones((3,))}}
    labels = S.cascade_freeze_labels(params)
    inner = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    tx = optax.multi_transform({"trainable": inner, "frozen": optax.set_to_zero()},
                               labels)
    opt_state = tx.init(params)
    assert S.get_learning_rate(opt_state) == pytest.approx(1e-3)
    new_state = S.set_learning_rate(opt_state, 5e-4)
    assert S.get_learning_rate(new_state) == pytest.approx(5e-4)


def test_set_learning_rate_raises_without_injection():
    import optax

    from dose_prediction_tpu.train import state as S

    tx = optax.adam(1e-3)  # no inject_hyperparams anywhere
    opt_state = tx.init({"w": jnp.ones((2,))})
    with pytest.raises(ValueError, match="no injected"):
        S.set_learning_rate(opt_state, 1e-4)


def test_checkpoint_legacy_layout_fallback(tmp_path):
    """Checkpoints written at <dir>/<step>/ (the pre-monitored/ layout) are
    still found by restore_latest instead of silently restarting a run."""
    from dose_prediction_tpu.core.checkpoint import (
        CheckpointManager,
        save_checkpoint,
    )

    tree = {"state": {"w": np.arange(4, dtype=np.float32)}, "epoch": 7}
    save_checkpoint(tmp_path / "ckpt" / "7", tree)
    mgr = CheckpointManager(tmp_path / "ckpt", monitor="m", mode="max")
    step, restored = mgr.restore_latest()
    assert step == 7
    np.testing.assert_array_equal(restored["state"]["w"], tree["state"]["w"])
    mgr.close()


def test_asha_counts_only_rung_halts_as_early_stops():
    """Trials that run to the full max_t budget are 'completed', not
    early-stopped; num_early_stopped counts rung-based halts only."""
    from dose_prediction_tpu.train.tune import (
        ASHAScheduler,
        LogUniform,
        run_search,
    )

    # identical metrics: no trial is ever below the rung cutoff → zero halts
    sched = ASHAScheduler(max_t=4, grace_period=1, reduction_factor=2, mode="min")

    def train_trial(config, report):
        for epoch in range(1, 5):
            if report(epoch, 1.0):
                return 1.0
        return 1.0

    res = run_search(train_trial, space={"lr": LogUniform(1e-4, 1e-1)},
                     num_samples=4, scheduler=sched, seed=0, mode="min")
    assert res["num_early_stopped"] == 0
    assert all(t["completed"] for t in res["trials"])

    # wide spread: the bad trials stop at rungs and ARE counted
    sched2 = ASHAScheduler(max_t=16, grace_period=1, reduction_factor=2, mode="min")

    def train_trial2(config, report):
        for epoch in range(1, 17):
            if report(epoch, config["lr"]):
                return config["lr"]
        return config["lr"]

    res2 = run_search(train_trial2, space={"lr": LogUniform(1e-4, 1e-1)},
                      num_samples=8, scheduler=sched2, seed=3, mode="min")
    stopped = sum(t["stopped"] for t in res2["trials"])
    assert res2["num_early_stopped"] == stopped > 0
    assert not any(t["stopped"] and t["completed"] for t in res2["trials"])


def test_augment_decisions_shared_between_paths(rng):
    """apply_dose_augment(pre-drawn decisions) matches augment_dose_sample
    consuming the identical rng stream — the native-fallback path reuses one
    set of draws instead of redrawing."""
    from dose_prediction_tpu.data import transforms as T

    inp = rng.standard_normal((8, 8, 8, 9)).astype(np.float32)
    gt = rng.standard_normal((8, 8, 8, 2)).astype(np.float32)
    for seed in range(20):
        r1 = np.random.default_rng(seed)
        r2 = np.random.default_rng(seed)
        decisions = T.draw_augment_decisions(r1)
        a_inp, a_gt = T.apply_dose_augment(inp, gt, *decisions)
        b_inp, b_gt = T.augment_dose_sample(inp, gt, r2)
        np.testing.assert_array_equal(a_inp, b_inp)
        np.testing.assert_array_equal(a_gt, b_gt)
        # both paths consumed the same number of draws
        assert r1.random() == r2.random()


def test_profiler_trace_propagates_body_exceptions(tmp_path):
    """trace() must not swallow exceptions raised by the profiled body (the
    old wrapper turned them into contextlib's 'generator didn't stop')."""
    from dose_prediction_tpu.utils.profiling import trace

    with pytest.raises(ValueError, match="boom"):
        with trace(str(tmp_path / "prof")):
            raise ValueError("boom")
    # and the no-op path too
    with pytest.raises(ValueError, match="boom"):
        with trace(None):
            raise ValueError("boom")


def test_pack_declines_more_than_7_oar_channels():
    """An 8th OAR channel would collide with the dose-mask bit — packing must
    decline, not corrupt."""
    import types

    from dose_prediction_tpu.data.packed import pack_patient

    shape = (4, 4, 4)
    p = types.SimpleNamespace(
        patient_id="p8",
        ptv=np.zeros(shape, np.float32),
        oars=np.zeros((*shape, 8), np.float32),
        ct=np.zeros(shape, np.float32),
        dose=np.zeros(shape, np.float32),
        dose_mask=np.ones(shape, np.float32),
    )
    assert pack_patient(p) is None


def test_sharded_sw_cache_is_bounded():
    from dose_prediction_tpu.infer import sliding_window as SW

    assert SW._SHARDED_FN_CACHE_MAX >= 1
    # simulate unbounded-lambda abuse: distinct keys beyond the bound evict
    SW._SHARDED_FN_CACHE.clear()
    for i in range(SW._SHARDED_FN_CACHE_MAX + 5):
        SW._SHARDED_FN_CACHE[("fake", i)] = i
        while len(SW._SHARDED_FN_CACHE) > SW._SHARDED_FN_CACHE_MAX:
            SW._SHARDED_FN_CACHE.popitem(last=False)
    assert len(SW._SHARDED_FN_CACHE) == SW._SHARDED_FN_CACHE_MAX
    SW._SHARDED_FN_CACHE.clear()

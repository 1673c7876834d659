"""Tests for the HPO (random+ASHA, PB2-lite) and k-fold drivers."""

import numpy as np
import pytest

from dose_prediction_tpu.train.kfold import kfold_split, run_kfold
from dose_prediction_tpu.train.tune import (
    ASHAScheduler,
    Choice,
    LogUniform,
    PopulationBasedScheduler,
    run_pbt,
    run_search,
    sample_config,
)


def test_kfold_split_reproducible_and_disjoint():
    a = kfold_split(200, 6, seed=123456)
    b = kfold_split(200, 6, seed=123456)
    for (ta, va), (tb, vb) in zip(a, b):
        np.testing.assert_array_equal(va, vb)
    all_val = np.concatenate([v for _, v in a])
    assert sorted(all_val.tolist()) == list(range(200))
    for t, v in a:
        assert set(t) & set(v) == set()
        assert len(t) + len(v) == 200


def test_kfold_driver_runs_each_fold(tmp_path):
    calls = []

    class FakeTrainer:
        def __init__(self, fold, ckpt_dir):
            self.fold = fold

        def fit(self, train_ds, val_ds):
            calls.append((self.fold, len(train_ds), len(val_ds)))

        def test(self, val_ds):
            return {"mean_dose_score": float(self.fold)}

    class FakeDS:
        patients = list(range(12))

        def __len__(self):
            return 12

        def __getitem__(self, i):
            return i

    ds = FakeDS()
    ds.patients = [object() for _ in range(12)]
    results = run_kfold(ds, lambda f, d: FakeTrainer(f, d), n_folds=3,
                        base_dir=str(tmp_path))
    assert len(calls) == 3
    assert all(t + v == 12 for _, t, v in calls)
    assert results[2]["mean_dose_score"] == 2.0


def test_sample_config_spaces():
    rng = np.random.default_rng(0)
    space = {"act": Choice(["relu", "mish"]), "lr": LogUniform(1e-4, 1e-1), "fixed": 7}
    cfg = sample_config(space, rng)
    assert cfg["act"] in ("relu", "mish")
    assert 1e-4 <= cfg["lr"] <= 1e-1
    assert cfg["fixed"] == 7


def test_asha_stops_bad_trials():
    sched = ASHAScheduler(max_t=16, grace_period=2, reduction_factor=2, mode="min")

    def train_trial(config, report):
        val = config["lr"]  # pretend loss == lr
        for epoch in range(1, 17):
            if report(epoch, val):
                return val
        return val

    res = run_search(train_trial, space={"lr": LogUniform(1e-4, 1e-1)},
                     num_samples=8, scheduler=sched, seed=1, mode="min")
    assert res["best_value"] == min(t["last_value"] for t in res["trials"])


def test_pbt_improves_population():
    """Metric = lr (lower better); PBT should drag the population toward the
    best member's config over time."""
    def init_state(cfg):
        return {}

    def train_epoch(cfg, st, epoch):
        return st, cfg["lr"]

    res = run_pbt(train_epoch, init_state,
                  space={"lr": LogUniform(1e-3, 1.0)},
                  scheduler=PopulationBasedScheduler(
                      population=6, perturbation_interval=2, seed=0,
                      bounds={"lr": (1e-4, 1.0)}),
                  num_epochs=10)
    values = [t["last_value"] for t in res["trials"]]
    assert res["best_value"] == min(values)
    # population collapsed near the best: spread shrinks vs a log-uniform draw
    assert max(values) / min(values) < 1e2

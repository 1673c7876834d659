"""Hyperparameter search driver: random/grid sampling + ASHA early stopping.

Parity target: DosePrediction/Train/tune_light_pyfer.py — Ray Tune with an
ASHAScheduler over {act, multiS_conv, lr, weight_decay} (:160-171). The TPU
replacement is a self-contained trial scheduler: trials run sequentially on
the chip (or one per slice when more are available); ASHA promotion/halting
logic is local, no Ray dependency.
"""

from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# search space (tune.choice / tune.loguniform analogues, :160-168)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Choice:
    options: Sequence[Any]

    def sample(self, rng: np.random.Generator):
        return self.options[int(rng.integers(len(self.options)))]


@dataclasses.dataclass
class LogUniform:
    low: float
    high: float

    def sample(self, rng: np.random.Generator) -> float:
        return float(np.exp(rng.uniform(np.log(self.low), np.log(self.high))))


@dataclasses.dataclass
class Uniform:
    low: float
    high: float

    def sample(self, rng: np.random.Generator) -> float:
        return float(rng.uniform(self.low, self.high))


PYFER_SEARCH_SPACE: Dict[str, Any] = {
    # tune_light_pyfer.py:160-168
    "act": Choice(["relu", "mish"]),
    "multiS_conv": Choice([True, False]),
    "lr": LogUniform(1e-4, 1e-1),
    "weight_decay": LogUniform(1e-5, 1e-1),
}


def sample_config(space: Dict[str, Any], rng: np.random.Generator) -> Dict[str, Any]:
    out = {}
    for k, v in space.items():
        out[k] = v.sample(rng) if hasattr(v, "sample") else v
    return out


# ---------------------------------------------------------------------------
# ASHA (asynchronous successive halving)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Trial:
    trial_id: int
    config: Dict[str, Any]
    rung: int = 0
    last_value: float = math.nan
    stopped: bool = False
    history: List[float] = dataclasses.field(default_factory=list)


class ASHAScheduler:
    """Promotion rungs at grace_period · reduction_factor^k epochs; a trial is
    stopped at a rung if its metric is not in the top 1/reduction_factor of
    completed results at that rung (mode='min' or 'max')."""

    def __init__(self, *, max_t: int = 100, grace_period: int = 1,
                 reduction_factor: int = 2, mode: str = "min"):
        self.max_t = max_t
        self.grace = grace_period
        self.rf = reduction_factor
        self.mode = mode
        self._rung_results: Dict[int, List[float]] = {}

    def milestones(self) -> List[int]:
        out = []
        t = self.grace
        while t < self.max_t:
            out.append(t)
            t *= self.rf
        return out

    def on_result(self, trial: Trial, epoch: int, value: float) -> bool:
        """Record a result; returns True if the trial should STOP."""
        trial.last_value = value
        trial.history.append(value)
        if epoch >= self.max_t:
            trial.stopped = True
            return True
        if epoch in self.milestones():
            results = self._rung_results.setdefault(epoch, [])
            results.append(value)
            ranked = sorted(results, reverse=(self.mode == "max"))
            cutoff_n = max(1, len(ranked) // self.rf)
            cutoff = ranked[cutoff_n - 1]
            keep = value >= cutoff if self.mode == "max" else value <= cutoff
            if not keep:
                trial.stopped = True
                return True
        return False


class PopulationBasedScheduler:
    """PB2-style population-based training (tune_light_pyfer.py:124-145
    analogue): a population of trials trains in parallel epochs; at each
    ``perturbation_interval`` the bottom quantile copies the config of a top
    performer and perturbs continuous hyperparameters by ×0.8 / ×1.25."""

    def __init__(self, *, population: int = 4, perturbation_interval: int = 4,
                 quantile: float = 0.25, mode: str = "min", seed: int = 0,
                 bounds: Optional[Dict[str, Tuple[float, float]]] = None):
        self.population = population
        self.interval = perturbation_interval
        self.quantile = quantile
        self.mode = mode
        self.rng = np.random.default_rng(seed)
        self.bounds = bounds or {}

    def exploit_explore(self, trials: List[Trial]) -> None:
        """Mutate the bottom quantile in place from the top quantile."""
        ranked = sorted(trials, key=lambda t: t.last_value,
                        reverse=(self.mode == "max"))
        n_q = max(1, int(len(ranked) * self.quantile))
        top, bottom = ranked[:n_q], ranked[-n_q:]
        for t in bottom:
            src = top[int(self.rng.integers(len(top)))]
            new_cfg = dict(src.config)
            for k, v in new_cfg.items():
                if isinstance(v, float):
                    factor = 0.8 if self.rng.random() < 0.5 else 1.25
                    nv = v * factor
                    if k in self.bounds:
                        lo, hi = self.bounds[k]
                        nv = float(np.clip(nv, lo, hi))
                    new_cfg[k] = nv
            t.config = new_cfg


def run_pbt(
    train_epoch: Callable[[Dict[str, Any], Any, int], Tuple[Any, float]],
    init_trial_state: Callable[[Dict[str, Any]], Any],
    *,
    space: Optional[Dict[str, Any]] = None,
    scheduler: Optional[PopulationBasedScheduler] = None,
    num_epochs: int = 16,
    seed: int = 0,
) -> Dict[str, Any]:
    """Population-based training loop.

    ``init_trial_state(config)`` builds per-trial mutable state (train state);
    ``train_epoch(config, trial_state, epoch) -> (trial_state, metric)`` runs
    one epoch. Population members run round-robin on the single chip.
    """
    space = space if space is not None else PYFER_SEARCH_SPACE
    scheduler = scheduler or PopulationBasedScheduler(seed=seed)
    rng = np.random.default_rng(seed)
    trials = [Trial(trial_id=i, config=sample_config(space, rng))
              for i in range(scheduler.population)]
    states = [init_trial_state(t.config) for t in trials]
    for epoch in range(num_epochs):
        for t, i in zip(trials, range(len(trials))):
            states[i], metric = train_epoch(t.config, states[i], epoch)
            t.last_value = metric
            t.history.append(metric)
        if (epoch + 1) % scheduler.interval == 0:
            scheduler.exploit_explore(trials)
    best = (max if scheduler.mode == "max" else min)(
        trials, key=lambda t: t.last_value)
    return {"best_config": best.config, "best_value": best.last_value,
            "trials": [dataclasses.asdict(t) for t in trials]}


def run_search(
    train_trial: Callable[[Dict[str, Any], Callable[[int, float], bool]], float],
    *,
    space: Dict[str, Any] = None,
    num_samples: int = 10,
    scheduler: Optional[ASHAScheduler] = None,
    seed: int = 0,
    mode: str = "min",
    out_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Run the search.

    ``train_trial(config, report) -> final_value`` trains one configuration;
    it must call ``report(epoch, value)`` each validation round and abort when
    report returns True (early-stopped by ASHA).

    Returns {'best_config', 'best_value', 'trials'}.
    """
    space = space if space is not None else PYFER_SEARCH_SPACE
    scheduler = scheduler or ASHAScheduler(mode=mode)
    rng = np.random.default_rng(seed)
    trials: List[Trial] = []
    for i in range(num_samples):
        trial = Trial(trial_id=i, config=sample_config(space, rng))
        stop_flag = {"stop": False}

        def report(epoch: int, value: float, _trial=trial) -> bool:
            return scheduler.on_result(_trial, epoch, value)

        final = train_trial(trial.config, report)
        if not math.isnan(final):
            trial.last_value = final
        trials.append(trial)

    valid = [t for t in trials if not math.isnan(t.last_value)]
    best = (max if mode == "max" else min)(valid, key=lambda t: t.last_value)
    result = {
        "best_config": best.config,
        "best_value": best.last_value,
        "trials": [dataclasses.asdict(t) for t in trials],
    }
    if out_dir:
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        with open(Path(out_dir) / "search_results.json", "w") as f:
            json.dump(result, f, indent=2, default=str)
    return result

"""K-fold cross-validation driver.

Parity target: DosePrediction/Train/k_fold_train_light_pyfer.py — 6 folds via
monai CrossValidation over the 200 training patients (seed 123456, :333-341),
each fold trains a fresh Pyfer and can resume from its own checkpoint dir
(:344-379).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from dose_prediction_tpu.data.openkbp import OpenKBPDataset


def kfold_split(n_items: int, n_folds: int = 6, *, seed: int = 123456
                ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Fold membership matching monai ``CrossValidation`` bit-for-bit
    (k_fold_train_light_pyfer.py:336-341): monai's ``partition_dataset(
    num_partitions=nfolds, shuffle=True, seed=…)`` shuffles ``range(n)``
    in-place with the LEGACY ``np.random.RandomState(seed)`` generator, then
    partitions by STRIDE (partition i = ``indices[i::nfolds]`` — NOT
    contiguous chunks). Fold f's train set concatenates partitions
    0..f-1, f+1.. in index order (``select_cross_validation_folds``, mirroring
    ``folds[0:fold] + folds[fold+1:]`` at :346-348); its val set is partition
    f. Seed 123456 preserved (:340). Returns (train_idx, val_idx) per fold."""
    indices = np.arange(n_items)
    np.random.RandomState(seed).shuffle(indices)
    parts = [indices[i::n_folds] for i in range(n_folds)]
    out = []
    for i in range(n_folds):
        val_idx = parts[i]
        train_idx = np.concatenate([parts[j] for j in range(n_folds) if j != i])
        out.append((train_idx, val_idx))
    return out


class _Subset:
    """Index view over an OpenKBPDataset (shares the RAM cache)."""

    def __init__(self, base: OpenKBPDataset, indices: Sequence[int]):
        self._base = base
        self._idx = list(int(i) for i in indices)
        self.patients = [base.patients[i] for i in self._idx]

    def __len__(self):
        return len(self._idx)

    def __getitem__(self, i):
        return self._base[self._idx[i]]


def run_kfold(
    dataset: OpenKBPDataset,
    make_trainer: Callable[[int, str], object],
    *,
    n_folds: int = 6,
    seed: int = 123456,
    start_fold: int = 0,
    base_dir: str = "kfold",
) -> Dict[int, Dict]:
    """Train each fold with a trainer built by ``make_trainer(fold, ckpt_dir)``
    (must expose .fit(train_ds, val_ds) and .test(val_ds)). ``start_fold``
    resumes the loop mid-way (:344)."""
    results: Dict[int, Dict] = {}
    splits = kfold_split(len(dataset), n_folds, seed=seed)
    for fold in range(start_fold, n_folds):
        train_idx, val_idx = splits[fold]
        fold_dir = str(Path(base_dir) / f"fold_{fold}")
        trainer = make_trainer(fold, fold_dir)
        train_ds = _Subset(dataset, train_idx)
        val_ds = _Subset(dataset, val_idx)
        trainer.fit(train_ds, val_ds)
        results[fold] = trainer.test(val_ds) if hasattr(trainer, "test") else {}
    return results

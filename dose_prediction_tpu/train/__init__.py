"""Training layer: losses, optimizers/state, jit step factories, trainers,
k-fold and HPO drivers, linked-model evaluation, 8-bit optimizer."""

from dose_prediction_tpu.train import losses
from dose_prediction_tpu.train.adam8bit import adam8bit
from dose_prediction_tpu.train.kfold import kfold_split, run_kfold
from dose_prediction_tpu.train.state import (
    ReduceLROnPlateau,
    TrainState,
    cascade_freeze_labels,
    cosine_schedule,
    create_train_state,
    make_optimizer,
    make_split_lr_optimizer,
    multistep_schedule,
)
from dose_prediction_tpu.train.trainers import (
    CascadeC3DTrainer,
    DoseGANTrainer,
    ExpModelTrainer,
    HDUNetTrainer,
    PyferTrainer,
    TrainConfig,
    TranSegTrainer,
    evaluate_dose_model,
)
from dose_prediction_tpu.train.tune import ASHAScheduler, run_pbt, run_search

__all__ = [
    "ASHAScheduler",
    "CascadeC3DTrainer",
    "DoseGANTrainer",
    "ExpModelTrainer",
    "HDUNetTrainer",
    "PyferTrainer",
    "ReduceLROnPlateau",
    "TrainConfig",
    "TrainState",
    "TranSegTrainer",
    "adam8bit",
    "cascade_freeze_labels",
    "cosine_schedule",
    "create_train_state",
    "evaluate_dose_model",
    "kfold_split",
    "losses",
    "make_optimizer",
    "make_split_lr_optimizer",
    "multistep_schedule",
    "run_kfold",
    "run_pbt",
    "run_search",
]

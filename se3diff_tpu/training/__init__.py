from se3diff_tpu.training.data import EnsembleDataset, MultiEnsembleDataset
from se3diff_tpu.training.dsm import (
    dsm_loss,
    make_dsm_train_step,
    make_sharded_dsm_train_step,
)
from se3diff_tpu.training.loop import TrainConfig, make_optimizer, train_dsm

__all__ = [
    "EnsembleDataset",
    "MultiEnsembleDataset",
    "dsm_loss",
    "make_dsm_train_step",
    "make_sharded_dsm_train_step",
    "TrainConfig",
    "make_optimizer",
    "train_dsm",
]

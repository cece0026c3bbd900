from se3diff_tpu.training.dsm import (
    dsm_loss,
    make_dsm_train_step,
    make_sharded_dsm_train_step,
)

__all__ = ["dsm_loss", "make_dsm_train_step", "make_sharded_dsm_train_step"]

from pytorchrec_tpu.loss.losses import (
    bce_loss,
    bpr_loss,
    get_loss,
    loss_name_list,
    mse_loss,
    top1_loss,
)

__all__ = [
    "get_loss",
    "loss_name_list",
    "bpr_loss",
    "top1_loss",
    "mse_loss",
    "bce_loss",
]

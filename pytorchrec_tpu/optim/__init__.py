from pytorchrec_tpu.optim.optimizers import (
    build_optimizer,
    get_optimizer,
    optimizer_name_list,
)

__all__ = ["build_optimizer", "get_optimizer", "optimizer_name_list"]

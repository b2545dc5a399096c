from advise_tpu.solver.lr_policy import (
    PlateauController,
    get_lr_at_epoch,
    lr_func_cosine,
)
from advise_tpu.solver.optimizer import (
    OptimizerBundle,
    adjust_base_lr,
    apply_direction,
    build_tx,
    classify_params,
    global_grad_norm,
    layer_decay_scales,
    wd_tree,
)

__all__ = [
    "PlateauController",
    "get_lr_at_epoch",
    "lr_func_cosine",
    "OptimizerBundle",
    "adjust_base_lr",
    "apply_direction",
    "build_tx",
    "classify_params",
    "global_grad_norm",
    "layer_decay_scales",
    "wd_tree",
]

from .state import TrainState, create_train_state, cosine_lr_after_step
from .step import make_train_step, make_dp_train_step

__all__ = [
    "TrainState",
    "create_train_state",
    "cosine_lr_after_step",
    "make_train_step",
    "make_dp_train_step",
]

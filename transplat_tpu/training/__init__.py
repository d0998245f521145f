from .schedule import make_lr_schedule
from .step import TrainState, create_train_state, make_train_step

__all__ = ["make_lr_schedule", "TrainState", "create_train_state", "make_train_step"]

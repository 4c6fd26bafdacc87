from duodiff_tpu.training.losses import deediff_loss, uvit_loss
from duodiff_tpu.training.lr import cosine_schedule_with_warmup
from duodiff_tpu.training.train_state import TrainState, create_train_state

__all__ = [
    "uvit_loss",
    "deediff_loss",
    "cosine_schedule_with_warmup",
    "TrainState",
    "create_train_state",
]

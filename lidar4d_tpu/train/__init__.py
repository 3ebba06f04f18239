from .losses import elementwise_loss, LossConfig
from .optimizer import make_optimizer, lr_schedule
from .ema import EmaState, ema_init, ema_update, ema_params
from .train_step import TrainState, make_train_step, init_train_state
from .trainer import Trainer

__all__ = [
    "elementwise_loss",
    "LossConfig",
    "make_optimizer",
    "lr_schedule",
    "EmaState",
    "ema_init",
    "ema_update",
    "ema_params",
    "TrainState",
    "make_train_step",
    "init_train_state",
    "Trainer",
]

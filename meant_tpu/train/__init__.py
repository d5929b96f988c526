from .classify import TrainState, meant_trainer, sigmoid_ce_loss
from .optim import build_optimizer, epoch_schedule

__all__ = ["TrainState", "meant_trainer", "sigmoid_ce_loss",
           "build_optimizer", "epoch_schedule"]

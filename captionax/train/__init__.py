from captionax.train.losses import cross_entropy_loss, label_smoothing_loss
from captionax.train.state import TrainState, PlateauScheduler, make_optimizer

__all__ = [
    "cross_entropy_loss",
    "label_smoothing_loss",
    "TrainState",
    "PlateauScheduler",
    "make_optimizer",
]

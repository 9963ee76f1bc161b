from .state import TrainState
from .losses import (
    classification_loss,
    heatmaps_loss,
    ae_grouping_loss,
    ae_keypoints_loss,
    TAG_LOSS_WEIGHT,
)
from .optim import create_optimizer, create_lr_scheduler, set_learning_rate, LRScheduler
from .steps import (
    classification_train_step,
    classification_val_step,
    keypoints_train_step,
    keypoints_val_step,
)

__all__ = [
    "TrainState",
    "classification_loss",
    "heatmaps_loss",
    "ae_grouping_loss",
    "ae_keypoints_loss",
    "TAG_LOSS_WEIGHT",
    "create_optimizer",
    "create_lr_scheduler",
    "set_learning_rate",
    "LRScheduler",
    "classification_train_step",
    "classification_val_step",
    "keypoints_train_step",
    "keypoints_val_step",
]

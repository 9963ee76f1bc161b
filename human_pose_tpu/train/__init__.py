from .state import TrainState
from .losses import (
    classification_loss,
    heatmaps_loss,
    ae_grouping_loss,
    ae_keypoints_loss,
    TAG_LOSS_WEIGHT,
)
from .optim import create_optimizer, create_lr_scheduler, set_learning_rate, LRScheduler
from .meters import AverageMeter, Meters
from .storage import MetricsStorage, SystemMonitoringStorage
from .checkpoint import save_checkpoint, load_checkpoint, load_train_state, load_params_partial
from .module import BaseModule, ClassificationModule, KeypointsModule, metrics_to_host
from .trainer import Trainer, DataModule
from .callbacks import (
    BaseCallback,
    Callbacks,
    SaveModelCheckpoint,
    MetricsPlotterCallback,
    MetricsSaverCallback,
    MetricsLogger,
    ModelSummary,
    SystemMetricsMonitoringCallback,
    ArtifactsLoggerCallback,
    DatasetExamplesCallback,
    ResultsPlotterCallback,
    default_callbacks,
)
from .steps import (
    accumulated_classification_train_step,
    accumulated_keypoints_train_step,
    classification_train_step,
    classification_val_step,
    keypoints_train_step,
    keypoints_val_step,
)

__all__ = [
    "AverageMeter",
    "Meters",
    "MetricsStorage",
    "SystemMonitoringStorage",
    "save_checkpoint",
    "load_checkpoint",
    "load_train_state",
    "load_params_partial",
    "BaseModule",
    "ClassificationModule",
    "KeypointsModule",
    "metrics_to_host",
    "Trainer",
    "DataModule",
    "BaseCallback",
    "Callbacks",
    "SaveModelCheckpoint",
    "MetricsPlotterCallback",
    "MetricsSaverCallback",
    "MetricsLogger",
    "ModelSummary",
    "SystemMetricsMonitoringCallback",
    "ArtifactsLoggerCallback",
    "DatasetExamplesCallback",
    "ResultsPlotterCallback",
    "default_callbacks",
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
    "accumulated_classification_train_step",
    "accumulated_keypoints_train_step",
    "classification_train_step",
    "classification_val_step",
    "keypoints_train_step",
    "keypoints_val_step",
]

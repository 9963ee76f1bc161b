from .structured import structure, unstructure
from .base import (
    BaseConfig,
    SetupConfig,
    TrainerConfig,
    DataloaderConfig,
    DatasetConfig,
    TransformConfig,
    ModuleConfig,
    NetConfig,
    InferenceConfig,
)
from .keypoints import KeypointsConfig, KeypointsTransformConfig
from .classification import ClassificationConfig, ClassificationTransformConfig
from .cli import parse_cli_value, update_dict, parse_args_for_config, update_config

__all__ = [
    "BaseConfig",
    "SetupConfig",
    "TrainerConfig",
    "DataloaderConfig",
    "DatasetConfig",
    "TransformConfig",
    "ModuleConfig",
    "NetConfig",
    "InferenceConfig",
    "KeypointsConfig",
    "KeypointsTransformConfig",
    "ClassificationConfig",
    "ClassificationTransformConfig",
    "structure",
    "unstructure",
    "parse_cli_value",
    "update_dict",
    "parse_args_for_config",
    "update_config",
]

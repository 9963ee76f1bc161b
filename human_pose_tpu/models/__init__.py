from .hrnet import HRNetBackbone, HRNetSPPE, BasicBlock, Bottleneck
from .higher_hrnet import HigherHRNet
from .classification import ClassificationHRNet
from .init import init_keypoints_weights, init_classification_weights
from .helpers import ConvBnAct, SEBlock
from .hourglass import HourglassNet, AEHourglassNet, HourglassModule, ResidualModule
from .resnet import ResNet, RESNET_SPECS
from .simple_baseline import SimpleBaseline

__all__ = [
    "HRNetBackbone",
    "HRNetSPPE",
    "BasicBlock",
    "Bottleneck",
    "HigherHRNet",
    "ClassificationHRNet",
    "init_keypoints_weights",
    "init_classification_weights",
    "ConvBnAct",
    "SEBlock",
    "HourglassNet",
    "AEHourglassNet",
    "HourglassModule",
    "ResidualModule",
    "ResNet",
    "RESNET_SPECS",
    "SimpleBaseline",
]

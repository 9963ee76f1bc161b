from .hrnet import HRNetBackbone, HRNetSPPE, BasicBlock, Bottleneck
from .higher_hrnet import HigherHRNet
from .classification import ClassificationHRNet
from .init import init_keypoints_weights, init_classification_weights

__all__ = [
    "HRNetBackbone",
    "HRNetSPPE",
    "BasicBlock",
    "Bottleneck",
    "HigherHRNet",
    "ClassificationHRNet",
    "init_keypoints_weights",
    "init_classification_weights",
]

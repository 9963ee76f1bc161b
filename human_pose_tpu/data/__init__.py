from .affine import (
    affine_transform_point,
    get_affine_transform,
    get_aug_affine_matrix,
    get_multi_scale_size,
    resize_align_multi_scale,
    transform_coords_inverse,
)
from .transforms import (
    COCO_FLIP_INDEX,
    ClassificationTransform,
    ComposeKeypointsTransform,
    KeypointsTransform,
    NormalizeKeypoints,
    RandomAffineTransform,
    RandomHorizontalFlip,
    inverse_normalize,
    normalize,
)
from .targets import HeatmapGenerator, JointsGenerator
from .rle import get_crowd_mask, segmentation_to_mask, polygons_to_mask
from .coco import (
    COCO_LABELS,
    COCO_LIMBS,
    CocoKeypointsDataset,
    collate,
    get_coco_joints,
    prebake_annotations,
)
from .imagenet import ImagenetClassificationDataset, collate_classification
from .loader import DataLoader
from .base import BaseImageDataset, DirectoryDataset, ExplorerDataset, InferenceDataset
from .mpii import MpiiKeypointsDataset, MPII_LABELS, MPII_LIMBS, MPII_FLIP_INDEX
from .video import InferenceVideoDataset, VideoProcessingResult

__all__ = [
    "affine_transform_point",
    "get_affine_transform",
    "get_aug_affine_matrix",
    "get_multi_scale_size",
    "resize_align_multi_scale",
    "transform_coords_inverse",
    "COCO_FLIP_INDEX",
    "ClassificationTransform",
    "ComposeKeypointsTransform",
    "KeypointsTransform",
    "NormalizeKeypoints",
    "RandomAffineTransform",
    "RandomHorizontalFlip",
    "inverse_normalize",
    "normalize",
    "HeatmapGenerator",
    "JointsGenerator",
    "get_crowd_mask",
    "segmentation_to_mask",
    "polygons_to_mask",
    "COCO_LABELS",
    "COCO_LIMBS",
    "CocoKeypointsDataset",
    "collate",
    "get_coco_joints",
    "prebake_annotations",
    "ImagenetClassificationDataset",
    "collate_classification",
    "DataLoader",
    "BaseImageDataset",
    "DirectoryDataset",
    "ExplorerDataset",
    "InferenceDataset",
    "MpiiKeypointsDataset",
    "MPII_LABELS",
    "MPII_LIMBS",
    "MPII_FLIP_INDEX",
    "InferenceVideoDataset",
    "VideoProcessingResult",
]

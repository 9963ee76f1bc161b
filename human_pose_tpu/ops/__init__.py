from .hungarian import hungarian, hungarian_batch
from .grouping import nms, top_k, match_by_tag, adjust, refine, refine_batch, parse, parse_batch, JOINTS_ORDER
from .flip import COCO_FLIP_INDEX, flip_back, merge_flip_heatmaps, stack_flip_tags
from .heatmaps import resize_bilinear, match_heatmaps_size, average_stages
from .decode import decode_batch
from .sppe import sppe_parse

__all__ = [
    "sppe_parse",
    "hungarian",
    "hungarian_batch",
    "nms",
    "top_k",
    "match_by_tag",
    "adjust",
    "refine",
    "parse",
    "parse_batch",
    "refine_batch",
    "JOINTS_ORDER",
    "COCO_FLIP_INDEX",
    "flip_back",
    "merge_flip_heatmaps",
    "stack_flip_tags",
    "resize_bilinear",
    "match_heatmaps_size",
    "average_stages",
    "decode_batch",
]

"""Flip-test (TTA) merging, NHWC.

Counterpart of reference src/keypoints/model.py:85-96: the second forward runs
on the horizontally flipped image; keypoint heatmaps are flipped back, channel-
permuted with the left/right COCO swap and averaged with the direct pass; tag
maps are flipped back + permuted and **concatenated** as a second embedding
dimension (not averaged).
"""

from __future__ import annotations

import jax.numpy as jnp

# reference src/keypoints/transforms.py:11
COCO_FLIP_INDEX = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15)


def flip_back(hms: jnp.ndarray, flip_index=COCO_FLIP_INDEX) -> jnp.ndarray:
    """Undo a horizontal flip on [N, H, W, K] heatmaps: mirror width and swap
    left/right keypoint channels."""
    idx = jnp.asarray(flip_index)
    return hms[:, :, ::-1, :][..., idx]


def merge_flip_heatmaps(hms: jnp.ndarray, flip_hms: jnp.ndarray, flip_index=COCO_FLIP_INDEX):
    """Average direct and flipped-back keypoint heatmaps."""
    return (hms + flip_back(flip_hms, flip_index)) / 2.0


def stack_flip_tags(tags: jnp.ndarray, flip_tags: jnp.ndarray, flip_index=COCO_FLIP_INDEX):
    """Stack direct tags and flipped-back tags along a new embedding axis:
    [N, H, W, K] x2 -> [N, H, W, K, 2]."""
    return jnp.stack([tags, flip_back(flip_tags, flip_index)], axis=-1)

"""End-to-end batched keypoint decode: model outputs -> grouped persons.

Mirrors the reference val/inference decode path
(/root/reference/src/keypoints/results.py:203-244):
  1. resize all heatmap stages to the largest stage and average
  2. resize the averaged heatmaps and each tag map to the model input size
  3. stack flip-TTA tag maps as an extra embedding dim
  4. parse (NMS -> top-k -> AE grouping -> adjust -> refine)

Everything is one jittable function, vmapped over the batch; heatmaps stay on
device through grouping (the reference crosses to CPU at top_k,
grouping.py:167-169).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .grouping import parse_batch
from .heatmaps import average_stages, resize_bilinear


@functools.partial(
    jax.jit,
    static_argnames=("input_hw", "max_num_people", "det_thr", "tag_thr", "do_adjust", "do_refine"),
)
def decode_batch(
    stages_kpts_heatmaps: list,
    tags_heatmaps_list: list,
    input_hw: tuple,
    max_num_people: int = 30,
    det_thr: float = 0.05,
    tag_thr: float = 0.5,
    do_adjust: bool = True,
    do_refine: bool = True,
):
    """Decode a batch of model outputs.

    Args:
      stages_kpts_heatmaps: list of [N, h_s, w_s, K] float32 (per stage)
      tags_heatmaps_list:   list of [N, h_t, w_t, K] float32 (len 2 with flip
                            TTA, len 1 otherwise) — stacked as embedding dims
      input_hw: (H, W) model input size to decode at

    Returns:
      joints [N, P, K, 3+E], person_scores [N, P], valid [N, P]
    """
    h, w = input_hw
    avg = average_stages([jnp.asarray(x, jnp.float32) for x in stages_kpts_heatmaps])
    avg = resize_bilinear(avg, h, w)  # [N, H, W, K]
    tags = jnp.stack(
        [resize_bilinear(jnp.asarray(t, jnp.float32), h, w) for t in tags_heatmaps_list],
        axis=-1,
    )  # [N, H, W, K, E]

    # parse works on [B, K, H, W] / [B, K, H, W, E]
    kpts_khw = jnp.transpose(avg, (0, 3, 1, 2))
    tags_khw = jnp.transpose(tags, (0, 3, 1, 2, 4))

    return parse_batch(
        kpts_khw, tags_khw,
        max_num_people=max_num_people, det_thr=det_thr, tag_thr=tag_thr,
        do_adjust=do_adjust, do_refine=do_refine,
    )

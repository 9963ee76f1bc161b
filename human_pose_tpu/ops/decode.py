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


def _fused_applicable(stages, tags_list, input_hw, max_num_people) -> bool:
    """The fused Pallas front-end handles the standard single-forward shape
    set: two heatmap stages at 1/4 and 1/2 of a 4-aligned input, tags at 1/4
    — with lane-friendly quarter widths. Anything else (multi-scale TTA
    aggregates, odd eval buckets, CPU) takes the dense XLA path."""
    import jax

    if jax.default_backend() != "tpu" or len(stages) != 2:
        return False
    h, w = input_hw
    if h % 4 or w % 4:
        return False
    h4, w4 = h // 4, w // 4
    if stages[0].shape[1:3] != (h4, w4) or stages[1].shape[1:3] != (2 * h4, 2 * w4):
        return False
    if any(t.shape[1:3] != (h4, w4) for t in tags_list):
        return False
    return h4 % 8 == 0 and w4 % 128 == 0 and 4 * h4 >= max_num_people


def decode_batch_fused(
    stages_kpts_heatmaps: list,
    tags_heatmaps_list: list,
    input_hw: tuple,
    max_num_people: int,
    det_thr: float,
    tag_thr: float,
    do_adjust: bool,
    do_refine: bool,
    interpret: bool = False,
):
    """Fused-decode front-end: one Pallas pass aggregates/upsamples/NMS's
    the heatmap stages (phase layout, ops/pallas_aggregate.py) and the tag
    maps stay at quarter resolution end-to-end (two-tap sampling at candidate
    coords; in-kernel upsample inside refine). Same decisions as the dense
    path; values may differ by ~1 ulp where XLA's one-einsum resize
    associates differently (pinned by tests/test_fused_decode.py)."""
    import jax

    from .grouping import (
        adjust_phase,
        group_from_candidates,
        refine_batch_phase,
    )
    from .pallas_aggregate import (
        fused_aggregate,
        phase_index,
        sample_tags_bilinear,
    )

    h, w = input_hw
    q = jnp.transpose(jnp.asarray(stages_kpts_heatmaps[0], jnp.float32), (0, 3, 1, 2))
    h2 = jnp.transpose(jnp.asarray(stages_kpts_heatmaps[1], jnp.float32), (0, 3, 1, 2))
    tags_lo = jnp.stack(
        [jnp.transpose(jnp.asarray(t, jnp.float32), (0, 3, 1, 2))
         for t in tags_heatmaps_list],
        axis=2,
    )  # [B, K, E, H4, W4]
    b, k, h4, w4 = q.shape
    m = max_num_people

    avg_phase, sup_phase, cmax = fused_aggregate(q, h2, interpret=interpret)

    # exact top-k with chunk = one image row (same proof as _chunked_top_k:
    # row maxima -> top-M rows, ids kept ascending, then an exact top-M over
    # the gathered rows resolves ties to the lowest flat index)
    n_rows = 4 * h4
    cmax_rows = jnp.transpose(cmax, (0, 1, 3, 2)).reshape(b, k, n_rows)
    _, row_ids = jax.lax.top_k(cmax_rows, m)
    row_ids = jnp.sort(row_ids, axis=-1)  # [B, K, M]
    xs_full = jnp.arange(4 * w4, dtype=jnp.int32)
    gidx = phase_index(row_ids[..., None], xs_full[None, None, None, :], h4, w4)
    sup_flat = sup_phase.reshape(b, k, -1)
    rows = jnp.take_along_axis(
        sup_flat, gidx.reshape(b, k, -1), axis=-1
    ).reshape(b, k, m, 4 * w4)
    scores_k, pos = jax.lax.top_k(rows.reshape(b, k, m * 4 * w4), m)
    x = (pos % (4 * w4)).astype(jnp.int32)
    y = jnp.take_along_axis(row_ids, pos // (4 * w4), axis=-1).astype(jnp.int32)
    coords_k = jnp.stack([x, y], axis=-1)  # (x, y) like grouping.top_k
    tags_k = jax.vmap(
        lambda tl, ys, xs: sample_tags_bilinear(tl, ys, xs, h, w)
    )(tags_lo, y, x)  # [B, K, M, E]

    grouped, valid = group_from_candidates(
        tags_k, coords_k, scores_k,
        det_thr=det_thr, tag_thr=tag_thr, use_pallas=not interpret,
    )

    if do_adjust:
        grouped = jax.vmap(adjust_phase)(grouped, avg_phase)
    person_scores = grouped[..., 2].mean(axis=2)
    if do_refine:
        grouped = refine_batch_phase(avg_phase, tags_lo, grouped, interpret=interpret)
    return grouped, person_scores, valid


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
    # NOTE: the fused phase-space front-end (decode_batch_fused below) is
    # NOT routed: measured on v5e it LOSES to this XLA chain
    # (fused_aggregate 1.24 vs XLA aggregate+NMS+rowmax 0.64 ms/img — the
    # phase-space shifts/selects are compute-bound on the VPU, while the
    # dense chain is already decently scheduled; refine_phase == refine_dense
    # at 1.5 ms/img, both dominated by the P x HW distance arithmetic).
    # Kept + tested (tests/test_fused_decode.py) as a documented experiment;
    # prof_fused.py reproduces the numbers.
    h, w = input_hw
    # Layout: transpose NHWC -> NKHW at the SOURCE (low) resolutions, then
    # resize/average in channel-major layout. Per-channel bilinear resize
    # commutes with the transpose bit-exactly (identical taps, weights and
    # accumulation per output element; pinned by test_ops), and relaying out
    # a 128^2x17 map costs 16x less HBM traffic than relaying the 512^2
    # result — the post-resize transposes were the hottest decode step.
    stages_khw = [
        jnp.transpose(jnp.asarray(x, jnp.float32), (0, 3, 1, 2))
        for x in stages_kpts_heatmaps
    ]
    avg = average_stages(stages_khw, channel_major=True)
    kpts_khw = resize_bilinear(avg, h, w, channel_major=True)  # [N, K, H, W]
    tags_khw = jnp.stack(
        [
            resize_bilinear(
                jnp.transpose(jnp.asarray(t, jnp.float32), (0, 3, 1, 2)),
                h, w, channel_major=True,
            )
            for t in tags_heatmaps_list
        ],
        axis=-1,
    )  # [N, K, H, W, E]

    return parse_batch(
        kpts_khw, tags_khw,
        max_num_people=max_num_people, det_thr=det_thr, tag_thr=tag_thr,
        do_adjust=do_adjust, do_refine=do_refine,
    )

"""Associative-embedding keypoint decode, fully jittable (TPU-native).

Re-implements the behavior of the reference MPPEHeatmapParser
(/root/reference/src/keypoints/grouping.py:62-283) as fixed-shape JAX:

* ``nms``          — 5x5 max-pool keep-equal suppression (grouping.py:80-83)
* ``top_k``        — per-joint top-M scores/coords/tags (grouping.py:147-170)
* ``match_by_tag`` — sequential greedy grouping over joints in the COCO
  ``JOINTS_ORDER`` (grouping.py:63-65), with the reference's cost
  ``round(dist)*100 - score`` (grouping.py:116-122), 1e10 column padding,
  Hungarian assignment (in-JAX, replacing the Python Munkres loop), the
  ``tag_thr`` gate on raw distances, and new-person creation for unmatched
  detections — expressed as a ``lax.scan`` over joints with fixed-size person
  slots instead of Python dicts.
* ``adjust``       — quarter-pixel offset toward the higher neighbor plus a
  0.5 center shift (grouping.py:172-191)
* ``refine``       — per-person recovery of missing joints by maximizing
  ``heatmap - round(tag_dist)`` (grouping.py:193-250)
* ``parse``        — the full pipeline incl. the single-best-person fallback
  (grouping.py:252-283); person score = mean joint score before refine.

Everything is float32 with static shapes [P, K, 3+E]; batch decoding is
``jax.vmap(parse)``. The heavy per-pixel work (NMS, top-k, refine distance
maps) runs on the VPU; the sequential scan is tiny (17 steps over 30x30
matrices).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hungarian import hungarian

# reference grouping.py:63-65 (1-based list converted to 0-based)
JOINTS_ORDER = tuple(
    i - 1 for i in [1, 2, 3, 4, 5, 6, 7, 12, 13, 8, 9, 10, 11, 14, 15, 16, 17]
)

_PAD = jnp.float32(1e10)


def nms(kpts_heatmaps: jnp.ndarray, pool_size: int = 5) -> jnp.ndarray:
    """Keep only local maxima of a [K, H, W] heatmap stack (5x5 window)."""
    pad = pool_size // 2
    pooled = jax.lax.reduce_window(
        kpts_heatmaps,
        -jnp.inf,
        jax.lax.max,
        (1, pool_size, pool_size),
        (1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad)],
    )
    return jnp.where(pooled == kpts_heatmaps, kpts_heatmaps, 0.0)


def top_k(kpts_hms: jnp.ndarray, tags_hms: jnp.ndarray, max_num_people: int):
    """Per-joint top-M detections after NMS.

    Args:
      kpts_hms: [K, H, W] float32
      tags_hms: [K, H, W, E] float32

    Returns:
      tags_k [K, M, E], coords_k [K, M, 2] int32 (x, y), scores_k [K, M]
    """
    k, h, w = kpts_hms.shape
    e = tags_hms.shape[-1]
    suppressed = nms(kpts_hms)
    flat = suppressed.reshape(k, h * w)
    scores_k, idxs = jax.lax.top_k(flat, max_num_people)  # [K, M] sorted desc
    x = (idxs % w).astype(jnp.int32)
    y = (idxs // w).astype(jnp.int32)
    coords_k = jnp.stack([x, y], axis=-1)
    tags_flat = tags_hms.reshape(k, h * w, e)
    tags_k = jnp.take_along_axis(tags_flat, idxs[..., None], axis=1)
    return tags_k, coords_k, scores_k


class _GroupState(NamedTuple):
    joints: jnp.ndarray  # [P, K, 3+E]
    tag_sum: jnp.ndarray  # [P, E]
    tag_cnt: jnp.ndarray  # [P]
    count: jnp.ndarray  # scalar int32, persons created (clipped at P)


def match_by_tag(
    tags_k: jnp.ndarray,
    coords_k: jnp.ndarray,
    scores_k: jnp.ndarray,
    det_thr: float = 0.1,
    tag_thr: float = 1.0,
    joints_order=JOINTS_ORDER,
):
    """Greedy sequential grouping (reference grouping.py:85-145).

    Returns (joints [P, K, 3+E], valid [P] bool) where P == M (max people).
    """
    k, m, e = tags_k.shape
    p = m  # person capacity == max_num_people, like the reference output cap
    order = jnp.asarray(joints_order, jnp.int32)

    init = _GroupState(
        joints=jnp.zeros((p, k, 3 + e), jnp.float32),
        tag_sum=jnp.zeros((p, e), jnp.float32),
        tag_cnt=jnp.zeros((p,), jnp.float32),
        count=jnp.int32(0),
    )

    def step(state: _GroupState, idx):
        cand_tags = tags_k[idx]  # [M, E]
        cand_scores = scores_k[idx]  # [M]
        cand_xy = coords_k[idx].astype(jnp.float32)  # [M, 2]
        cand_joint = jnp.concatenate(
            [cand_xy, cand_scores[:, None], cand_tags], axis=-1
        )  # [M, 3+E]
        valid_cand = cand_scores > det_thr

        def seed(state: _GroupState) -> _GroupState:
            slots = jnp.where(
                valid_cand, jnp.cumsum(valid_cand) - 1, p
            )  # invalid -> out-of-bounds (dropped)
            joints = state.joints.at[slots, idx].set(cand_joint, mode="drop")
            tag_sum = state.tag_sum.at[slots].set(cand_tags, mode="drop")
            tag_cnt = state.tag_cnt.at[slots].set(1.0, mode="drop")
            count = jnp.minimum(valid_cand.sum(), p).astype(jnp.int32)
            return _GroupState(joints, tag_sum, tag_cnt, count)

        def match(state: _GroupState) -> _GroupState:
            person_valid = jnp.arange(p) < state.count
            mean_tags = state.tag_sum / jnp.maximum(state.tag_cnt, 1.0)[:, None]
            diff = cand_tags[:, None, :] - mean_tags[None, :, :]  # [M, P, E]
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # [M, P]
            cost = jnp.round(dist) * 100.0 - cand_scores[:, None]
            # fake columns (nonexistent persons) ~ reference 1e10 padding
            cost = jnp.where(person_valid[None, :], cost, _PAD)
            # below-threshold candidates are padding rows. Sorting real rows
            # first (stable, preserving the reference's filtered-row order)
            # lets the solver run augmenting paths ONLY for real rows — the
            # sequential loop count is the decode's latency driver on TPU.
            order = jnp.argsort(~valid_cand, stable=True)
            n_real = valid_cand.sum()
            col_sorted = hungarian(cost[order], num_valid_rows=n_real)
            inv_order = jnp.argsort(order)
            col = col_sorted[inv_order]  # [M]; -1 for unassigned/fake rows

            col_c = jnp.clip(col, 0, p - 1)
            raw_d = jnp.take_along_axis(dist, col_c[:, None], axis=1)[:, 0]
            col_valid = (col >= 0) & jnp.take(person_valid, col_c)
            matched = valid_cand & col_valid & (raw_d < tag_thr)
            col = col_c

            tgt = jnp.where(matched, col, p)
            joints = state.joints.at[tgt, idx].set(cand_joint, mode="drop")
            tag_sum = state.tag_sum.at[tgt].add(
                jnp.where(matched[:, None], cand_tags, 0.0), mode="drop"
            )
            tag_cnt = state.tag_cnt.at[tgt].add(
                jnp.where(matched, 1.0, 0.0), mode="drop"
            )

            # unmatched valid candidates found new persons, in candidate order
            new = valid_cand & ~matched
            slots = jnp.where(new, state.count + jnp.cumsum(new) - 1, p)
            joints = joints.at[slots, idx].set(cand_joint, mode="drop")
            tag_sum = tag_sum.at[slots].set(
                jnp.where(new[:, None], cand_tags, 0.0), mode="drop"
            )
            tag_cnt = tag_cnt.at[slots].set(jnp.where(new, 1.0, 0.0), mode="drop")
            count = jnp.minimum(state.count + new.sum(), p).astype(jnp.int32)
            return _GroupState(joints, tag_sum, tag_cnt, count)

        state = jax.lax.cond(state.count == 0, seed, match, state)
        return state, None

    state, _ = jax.lax.scan(step, init, order)
    valid = jnp.arange(p) < state.count
    return state.joints, valid


def adjust(grouped_joints: jnp.ndarray, kpts_hms: jnp.ndarray) -> jnp.ndarray:
    """Quarter-pixel offset toward the higher neighbor + 0.5 center shift
    (reference grouping.py:172-191). Vectorized over persons and joints."""
    p, k, _ = grouped_joints.shape
    _, h, w = kpts_hms.shape
    x = grouped_joints[..., 0]
    y = grouped_joints[..., 1]
    score = grouped_joints[..., 2]
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    kk = jnp.broadcast_to(jnp.arange(k)[None, :], (p, k))

    right = kpts_hms[kk, yi, jnp.minimum(xi + 1, w - 1)]
    left = kpts_hms[kk, yi, jnp.maximum(xi - 1, 0)]
    down = kpts_hms[kk, jnp.minimum(yi + 1, h - 1), xi]
    up = kpts_hms[kk, jnp.maximum(yi - 1, 0), xi]

    new_x = x + jnp.where(right > left, 0.25, -0.25) + 0.5
    new_y = y + jnp.where(down > up, 0.25, -0.25) + 0.5
    keep = score == 0.0
    out = grouped_joints.at[..., 0].set(jnp.where(keep, x, new_x))
    out = out.at[..., 1].set(jnp.where(keep, y, new_y))
    return out


def _refine_person(kpts_hms, tags_hms, person_joints):
    """Recover missing joints for one person (reference grouping.py:193-250)."""
    k, h, w = kpts_hms.shape
    e = tags_hms.shape[-1]
    score = person_joints[:, 2]
    det = score > 0.0

    xi = jnp.clip(person_joints[:, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(person_joints[:, 1].astype(jnp.int32), 0, h - 1)
    kk = jnp.arange(k)
    det_tags = tags_hms[kk, yi, xi]  # [K, E]
    n_det = jnp.maximum(det.sum(), 1.0)
    prev_tag = jnp.sum(jnp.where(det[:, None], det_tags, 0.0), axis=0) / n_det  # [E]

    tags_dist = jnp.sqrt(
        jnp.sum((tags_hms - prev_tag[None, None, None, :]) ** 2, axis=-1)
    )  # [K, H, W]
    hms_diff = kpts_hms - jnp.round(tags_dist)
    flat_idx = jnp.argmax(hms_diff.reshape(k, h * w), axis=1)
    fy = (flat_idx // w).astype(jnp.int32)
    fx = (flat_idx % w).astype(jnp.int32)
    val = kpts_hms[kk, fy, fx]

    right = kpts_hms[kk, fy, jnp.minimum(fx + 1, w - 1)]
    left = kpts_hms[kk, fy, jnp.maximum(fx - 1, 0)]
    down = kpts_hms[kk, jnp.minimum(fy + 1, h - 1), fx]
    up = kpts_hms[kk, jnp.maximum(fy - 1, 0), fx]
    new_x = fx.astype(jnp.float32) + 0.5 + jnp.where(right > left, 0.25, -0.25)
    new_y = fy.astype(jnp.float32) + 0.5 + jnp.where(down > up, 0.25, -0.25)

    # only replace joints the grouping missed, only with positive detections,
    # and only for persons that have at least one detected joint
    replace = (val > 0.0) & (score == 0.0) & (det.sum() > 0)
    out = person_joints.at[:, 0].set(jnp.where(replace, new_x, person_joints[:, 0]))
    out = out.at[:, 1].set(jnp.where(replace, new_y, person_joints[:, 1]))
    out = out.at[:, 2].set(jnp.where(replace, val, person_joints[:, 2]))
    return out


def refine(kpts_hms, tags_hms, grouped_joints):
    """Refine all persons at once (reference grouping.py:193-250, vectorized).

    The per-person distance maps ``||tags - prev_tag_p||`` stay inside the
    argmax reduction (XLA fuses the broadcast into the reduce), so nothing of
    shape [P, K, H, W] is materialized; HBM traffic is one read of the tag and
    heatmap stacks instead of P reads as in the sequential formulation."""
    p_cap, k, _ = grouped_joints.shape
    _, h, w = kpts_hms.shape

    score = grouped_joints[..., 2]  # [P, K]
    det = score > 0.0
    xi = jnp.clip(grouped_joints[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(grouped_joints[..., 1].astype(jnp.int32), 0, h - 1)
    kk = jnp.broadcast_to(jnp.arange(k)[None, :], (p_cap, k))
    det_tags = tags_hms[kk, yi, xi]  # [P, K, E]
    n_det = jnp.maximum(det.sum(axis=1), 1.0)  # [P]
    prev_tag = (
        jnp.sum(jnp.where(det[..., None], det_tags, 0.0), axis=1) / n_det[:, None]
    )  # [P, E]

    # hms_diff[p, k, yx] = hm[k, yx] - round(||tags[k, yx] - prev[p]||)
    hm_flat = kpts_hms.reshape(k, h * w)  # [K, HW]

    use_pallas = jax.default_backend() == "tpu" and (h * w) % 128 == 0
    if use_pallas:
        from .pallas_decode import refine_argmax

        tags_kehw = jnp.transpose(tags_hms, (0, 3, 1, 2)).reshape(k, -1, h * w)
        idx_kp, _ = refine_argmax(hm_flat, tags_kehw, prev_tag)
        flat_idx = idx_kp.T  # [P, K]
    else:
        tags_flat = tags_hms.reshape(k, h * w, -1)  # [K, HW, E]

        def per_person(prev):  # [E] -> [K]
            d = jnp.sqrt(jnp.sum((tags_flat - prev[None, None, :]) ** 2, axis=-1))
            diff = hm_flat - jnp.round(d)
            return jnp.argmax(diff, axis=1)

        flat_idx = jax.vmap(per_person)(prev_tag)  # [P, K]
    fy = (flat_idx // w).astype(jnp.int32)
    fx = (flat_idx % w).astype(jnp.int32)
    val = kpts_hms[kk, fy, fx]  # [P, K]

    right = kpts_hms[kk, fy, jnp.minimum(fx + 1, w - 1)]
    left = kpts_hms[kk, fy, jnp.maximum(fx - 1, 0)]
    down = kpts_hms[kk, jnp.minimum(fy + 1, h - 1), fx]
    up = kpts_hms[kk, jnp.maximum(fy - 1, 0), fx]
    new_x = fx.astype(jnp.float32) + 0.5 + jnp.where(right > left, 0.25, -0.25)
    new_y = fy.astype(jnp.float32) + 0.5 + jnp.where(down > up, 0.25, -0.25)

    replace = (val > 0.0) & (score == 0.0) & (det.sum(axis=1, keepdims=True) > 0)
    out = grouped_joints.at[..., 0].set(
        jnp.where(replace, new_x, grouped_joints[..., 0])
    )
    out = out.at[..., 1].set(jnp.where(replace, new_y, grouped_joints[..., 1]))
    out = out.at[..., 2].set(jnp.where(replace, val, grouped_joints[..., 2]))
    return out


@functools.partial(
    jax.jit, static_argnames=("max_num_people", "det_thr", "tag_thr", "do_adjust", "do_refine")
)
def parse(
    kpts_hms: jnp.ndarray,
    tags_hms: jnp.ndarray,
    max_num_people: int = 30,
    det_thr: float = 0.1,
    tag_thr: float = 1.0,
    do_adjust: bool = True,
    do_refine: bool = True,
):
    """Full decode for one image (reference grouping.py:252-283).

    Args:
      kpts_hms: [K, H, W] float32 averaged keypoint heatmaps
      tags_hms: [K, H, W, E] float32 tag embeddings (E=2 with flip TTA)

    Returns:
      joints [P, K, 3+E] (x, y, score, tags), person_scores [P], valid [P]
    """
    tags_k, coords_k, scores_k = top_k(kpts_hms, tags_hms, max_num_people)
    grouped, valid = match_by_tag(tags_k, coords_k, scores_k, det_thr, tag_thr)

    # fallback: no grouped persons -> single best-per-joint person with
    # score 0.01 (reference grouping.py:262-269)
    def fallback(_):
        coords = coords_k[:, 0].astype(jnp.float32)  # [K, 2]
        tag = tags_k[:, 0]  # [K, E]
        score = jnp.full((kpts_hms.shape[0], 1), 0.01, jnp.float32)
        person = jnp.concatenate([coords, score, tag], axis=-1)
        joints = jnp.zeros_like(grouped).at[0].set(person)
        v = jnp.zeros_like(valid).at[0].set(True)
        return joints, v

    grouped, valid = jax.lax.cond(
        valid.any(), lambda _: (grouped, valid), fallback, None
    )

    if do_adjust:
        grouped = adjust(grouped, kpts_hms)
    person_scores = grouped[..., 2].mean(axis=1)
    if do_refine:
        grouped = refine(kpts_hms, tags_hms, grouped)
    return grouped, person_scores, valid

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
  detections — fixed-size person slots instead of Python dicts; the
  sequential joint loop runs as a lax.scan (XLA path) or entirely in-VMEM via
  the Pallas kernel in ops/pallas_match.py (TPU path, exact same results).
* ``adjust``       — quarter-pixel offset toward the higher neighbor plus a
  0.5 center shift (grouping.py:172-191)
* ``refine``       — per-person recovery of missing joints by maximizing
  ``heatmap - round(tag_dist)`` (grouping.py:193-250)
* ``parse``        — the full pipeline incl. the single-best-person fallback
  (grouping.py:252-283); person score = mean joint score before refine.

Everything is float32 with static shapes [P, K, 3+E]; batch decoding is
``parse_batch`` (batch on the Pallas grid on TPU). The heavy per-pixel work
(NMS, top-k, refine distance maps) runs on the VPU/MXU.
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


def joints_order_for(k: int) -> tuple:
    """Grouping order for a k-joint skeleton: the reference's COCO order
    restricted to existing joints (always a permutation of range(k) —
    a plain ``JOINTS_ORDER[:k]`` is NOT one for k in 8..12), with any
    joints beyond 17 appended in index order."""
    order = tuple(j for j in JOINTS_ORDER if j < k)
    return order + tuple(range(len(JOINTS_ORDER), k))



def nms(kpts_heatmaps: jnp.ndarray, pool_size: int = 5) -> jnp.ndarray:
    """Keep only local maxima of a [K, H, W] heatmap stack (5x5 window).

    Max-pooling is separable: two 1-D reduce_windows do 2*pool reads per
    element instead of pool^2 (the reference uses a dense torch MaxPool2d,
    grouping.py:74)."""
    pad = pool_size // 2
    pooled = jax.lax.reduce_window(
        kpts_heatmaps, -jnp.inf, jax.lax.max,
        (1, pool_size, 1), (1, 1, 1), [(0, 0), (pad, pad), (0, 0)],
    )
    pooled = jax.lax.reduce_window(
        pooled, -jnp.inf, jax.lax.max,
        (1, 1, pool_size), (1, 1, 1), [(0, 0), (0, 0), (pad, pad)],
    )
    return jnp.where(pooled == kpts_heatmaps, kpts_heatmaps, 0.0)


def _chunked_top_k(flat: jnp.ndarray, k_want: int, chunk: int = 256):
    """Exact top-k by hierarchical chunk-max selection.

    1. Per-chunk MAX (a cheap reduce — no sorting touches the full array).
    2. ``lax.top_k`` over the n/chunk chunk maxima picks k_want chunks.
    3. Those chunks' contents are gathered in ascending-chunk-id order and a
       small exact top-k runs over them.

    This is exact, ties included, with the same (value desc, flat-index asc)
    tie-break as one big ``lax.top_k``:

    * A top-k element in a dropped chunk is impossible: each of the k kept
      chunks holds an element with value >= the dropped chunk's max >= v. If
      that kept max is strictly greater it outranks v; if it ties, the kept
      chunk's id is lower (``top_k`` keeps the lower index among equal chunk
      maxima), so the tied element's flat index is lower and it still
      outranks v. That's k distinct elements ahead of v — contradiction.
    * Sorting the kept chunk ids ascending before the gather makes gathered
      positions monotone in flat index, so step 3's ``top_k`` resolves value
      ties to the lowest flat index, exactly like the unchunked op.

    vs the previous formulation (top-k per chunk, then top-k of the union):
    the full array is only touched by a max-reduce, which XLA fuses with the
    NMS producer; sorting is confined to [R, n/chunk] and [R, k*chunk].
    Measured on v5e @512^2 x 17: NMS+top-k 1.44 -> ~0.5 ms/img.
    """
    r, n = flat.shape
    n_chunks = -(-n // chunk)
    if n <= chunk * 4 or n_chunks <= k_want:
        return jax.lax.top_k(flat, k_want)
    pad = n_chunks * chunk - n
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    chunked = flat.reshape(r, n_chunks, chunk)
    chunk_max = chunked.max(axis=-1)  # [R, C] — the only full-array pass
    _, chunk_ids = jax.lax.top_k(chunk_max, k_want)  # [R, k], lower id on ties
    chunk_ids = jnp.sort(chunk_ids, axis=-1)  # ascending => flat-index order
    picked = jnp.take_along_axis(chunked, chunk_ids[..., None], axis=1)
    vals = picked.reshape(r, k_want * chunk)
    top_vals, pos = jax.lax.top_k(vals, k_want)
    # position -> global flat index
    src_chunk = jnp.take_along_axis(chunk_ids, pos // chunk, axis=1)
    top_idxs = src_chunk * chunk + pos % chunk
    return top_vals, top_idxs


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
    scores_k, idxs = _chunked_top_k(flat, max_num_people)  # [K, M] sorted desc
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
    joints_order=None,
):
    """Greedy sequential grouping (reference grouping.py:85-145).

    Returns (joints [P, K, 3+E], valid [P] bool) where P == M (max people).
    """
    k, m, e = tags_k.shape
    p = m  # person capacity == max_num_people, like the reference output cap
    if joints_order is None:
        joints_order = joints_order_for(k)
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
            # fake columns (nonexistent persons) ~ the reference's 1e10
            # padding (grouping.py:126-128). The PAD VALUE is semantically
            # free: any equal constant strictly above the max real cost
            # yields the same optimum set (exchange argument — an unmatched
            # real column plus a padded row can always be augmented at cost
            # < pad, so every optimum matches min(rows, cols) real pairs and
            # the pad constant contributes identically to all of them). A
            # literal 1e10 is NOT free in float32: once an augmenting path
            # crosses a pad column, JV potentials pick up +-1e10 offsets and
            # ulp(1e10) ~ 1024 swallows the round(dist)*100 - score
            # structure, yielding SUBOPTIMAL (non-reference) assignments
            # whenever candidates outnumber persons. Keep the pad just above
            # the max real cost so all magnitudes stay f32-homogeneous.
            real = valid_cand[:, None] & person_valid[None, :]
            max_real = jnp.max(jnp.where(real, cost, -jnp.inf))
            pad = jnp.where(
                jnp.isfinite(max_real), jnp.abs(max_real) * 2.0 + 100.0, 100.0
            )
            cost = jnp.where(person_valid[None, :], cost, pad)
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


def refine_batch(kpts_hms, tags_hms, grouped_joints):
    """Batched refine (reference grouping.py:193-250, vectorized).

    kpts_hms [B, K, H, W], tags_hms [B, K, H, W, E], grouped [B, P, K, 3+E].
    On TPU the per-person distance-surface argmax runs as a Pallas kernel
    (one HBM read of the maps total); elsewhere a vmapped XLA formulation.
    The kernel's person-chunk skip bound is derived HERE from the joints
    themselves — index of the last person with any detected joint, +1 — so
    it is safe regardless of whether valid persons occupy a contiguous slot
    prefix (round-4 advisor finding: a caller-supplied ``valid.sum`` count
    silently corrupts outputs for non-prefix validity)."""
    b, p_cap, k, _ = grouped_joints.shape
    h, w = kpts_hms.shape[2:]

    score = grouped_joints[..., 2]  # [B, P, K]
    det = score > 0.0
    # refine only ever replaces joints of persons with >=1 detection
    # (replace mask below requires det.sum > 0), so person chunks past the
    # last detected person can be skipped no matter how slots are laid out
    has_det = det.any(axis=2)  # [B, P]
    counts = (
        jnp.max(jnp.where(has_det, jnp.arange(p_cap)[None, :], -1), axis=1) + 1
    ).astype(jnp.int32)  # [B]
    xi = jnp.clip(grouped_joints[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(grouped_joints[..., 1].astype(jnp.int32), 0, h - 1)
    bb = jnp.arange(b)[:, None, None]
    kk = jnp.broadcast_to(jnp.arange(k)[None, None, :], (b, p_cap, k))
    det_tags = tags_hms[bb, kk, yi, xi]  # [B, P, K, E]
    n_det = jnp.maximum(det.sum(axis=2), 1.0)  # [B, P]
    prev_tag = (
        jnp.sum(jnp.where(det[..., None], det_tags, 0.0), axis=2) / n_det[..., None]
    )  # [B, P, E]

    hm_flat = kpts_hms.reshape(b, k, h * w)  # [B, K, HW]

    if _use_pallas(h, w):
        from .pallas_decode import refine_argmax_batch

        tags_kehw = jnp.transpose(tags_hms, (0, 1, 4, 2, 3)).reshape(b, k, -1, h * w)
        idx_bkp, _ = refine_argmax_batch(hm_flat, tags_kehw, prev_tag, counts)
        flat_idx = jnp.transpose(idx_bkp, (0, 2, 1))  # [B, P, K]
    else:
        tags_flat = tags_hms.reshape(b, k, h * w, -1)  # [B, K, HW, E]

        def per_person(tf, hf, prev):  # [K,HW,E], [K,HW], [E] -> [K]
            if tf.shape[-1] == 1:
                # single embedding dim: |d| exactly (the sqrt(d*d) form is a
                # 1-ulp approximation of it); matches the Pallas kernel
                d = jnp.abs(tf[..., 0] - prev[None, None, 0])
            else:
                d = jnp.sqrt(jnp.sum((tf - prev[None, None, :]) ** 2, axis=-1))
            return jnp.argmax(hf - jnp.round(d), axis=1)

        flat_idx = jax.vmap(
            lambda tf, hf, prevs: jax.vmap(lambda pv: per_person(tf, hf, pv))(prevs)
        )(tags_flat, hm_flat, prev_tag)  # [B, P, K]

    fy = (flat_idx // w).astype(jnp.int32)
    fx = (flat_idx % w).astype(jnp.int32)
    val = kpts_hms[bb, kk, fy, fx]  # [B, P, K]

    right = kpts_hms[bb, kk, fy, jnp.minimum(fx + 1, w - 1)]
    left = kpts_hms[bb, kk, fy, jnp.maximum(fx - 1, 0)]
    down = kpts_hms[bb, kk, jnp.minimum(fy + 1, h - 1), fx]
    up = kpts_hms[bb, kk, jnp.maximum(fy - 1, 0), fx]
    new_x = fx.astype(jnp.float32) + 0.5 + jnp.where(right > left, 0.25, -0.25)
    new_y = fy.astype(jnp.float32) + 0.5 + jnp.where(down > up, 0.25, -0.25)

    replace = (val > 0.0) & (score == 0.0) & (det.sum(axis=2, keepdims=True) > 0)
    out = grouped_joints.at[..., 0].set(
        jnp.where(replace, new_x, grouped_joints[..., 0])
    )
    out = out.at[..., 1].set(jnp.where(replace, new_y, grouped_joints[..., 1]))
    out = out.at[..., 2].set(jnp.where(replace, val, grouped_joints[..., 2]))
    return out


def refine(kpts_hms, tags_hms, grouped_joints):
    """Single-image refine; see refine_batch."""
    return refine_batch(kpts_hms[None], tags_hms[None], grouped_joints[None])[0]


def _use_pallas(h: int, w: int) -> bool:
    return jax.default_backend() == "tpu" and (h * w) % 128 == 0


def group_from_candidates(
    tags_k: jnp.ndarray,
    coords_k: jnp.ndarray,
    scores_k: jnp.ndarray,
    *,
    det_thr: float,
    tag_thr: float,
    use_pallas: bool,
):
    """AE grouping + fallback person from per-joint top-k candidates
    (the decode middle shared by the dense and fused front-ends).

    tags_k [B,K,M,E], coords_k [B,K,M,2] int (x,y), scores_k [B,K,M] ->
    (grouped [B,M,K,3+E], valid [B,M]).
    """
    b, k, m, e = tags_k.shape
    if use_pallas:
        from .pallas_match import match_by_tag_pallas_batched

        cand = jnp.concatenate(
            [coords_k.astype(jnp.float32), scores_k[..., None], tags_k], axis=-1
        )  # [B, K, M, 3+E]
        order = joints_order_for(k)
        cand_ordered = cand[:, jnp.asarray(order)]
        # unroll=4: measured on v5e (prof_match.py) dense worst case
        # 1.45 -> 1.11 ms/img, sparse neutral (0.36); exactness pinned by
        # tests/test_pallas_match.py KERNELS.
        grouped, count = match_by_tag_pallas_batched(
            cand_ordered, det_thr=det_thr, tag_thr=tag_thr,
            joints_order=tuple(order), num_persons=m, unroll=4,
        )
        valid = jnp.arange(m)[None, :] < count[:, None]
    else:
        order = joints_order_for(k)
        grouped, valid = jax.vmap(
            lambda t, c, s: match_by_tag(t, c, s, det_thr, tag_thr, order)
        )(tags_k, coords_k, scores_k)

    # fallback: no grouped persons -> single best-per-joint person with
    # score 0.01 (reference grouping.py:262-269)
    fb_coords = coords_k[:, :, 0].astype(jnp.float32)  # [B, K, 2]
    fb_tags = tags_k[:, :, 0]  # [B, K, E]
    fb_score = jnp.full((b, k, 1), 0.01, jnp.float32)
    fb_person = jnp.concatenate([fb_coords, fb_score, fb_tags], axis=-1)  # [B,K,F]
    fb_joints = jnp.zeros_like(grouped).at[:, 0].set(fb_person)
    fb_valid = jnp.zeros_like(valid).at[:, 0].set(True)
    need_fb = ~valid.any(axis=1)  # [B]
    grouped = jnp.where(need_fb[:, None, None, None], fb_joints, grouped)
    valid = jnp.where(need_fb[:, None], fb_valid, valid)
    return grouped, valid


def adjust_phase(grouped_joints: jnp.ndarray, avg_phase: jnp.ndarray) -> jnp.ndarray:
    """``adjust`` reading a phase-layout heatmap (fused decode front-end);
    identical decisions and arithmetic, only the gather indexing differs."""
    from .pallas_aggregate import phase_gather

    p, k, _ = grouped_joints.shape
    h4, w4 = avg_phase.shape[-2:]
    h, w = 4 * h4, 4 * w4
    x = grouped_joints[..., 0]
    y = grouped_joints[..., 1]
    score = grouped_joints[..., 2]
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    kk = jnp.broadcast_to(jnp.arange(k)[None, :], (p, k))

    right = phase_gather(avg_phase, kk, yi, jnp.minimum(xi + 1, w - 1))
    left = phase_gather(avg_phase, kk, yi, jnp.maximum(xi - 1, 0))
    down = phase_gather(avg_phase, kk, jnp.minimum(yi + 1, h - 1), xi)
    up = phase_gather(avg_phase, kk, jnp.maximum(yi - 1, 0), xi)

    new_x = x + jnp.where(right > left, 0.25, -0.25) + 0.5
    new_y = y + jnp.where(down > up, 0.25, -0.25) + 0.5
    keep = score == 0.0
    out = grouped_joints.at[..., 0].set(jnp.where(keep, x, new_x))
    out = out.at[..., 1].set(jnp.where(keep, y, new_y))
    return out


def refine_batch_phase(avg_phase, tags_lo, grouped_joints, interpret: bool = False):
    """``refine_batch`` for the fused decode front-end: heatmaps in phase
    layout, tag maps at quarter resolution (upsampled on the fly — both in
    the Pallas argmax kernel and in the two-tap candidate sampling)."""
    from .pallas_aggregate import (
        phase_gather,
        refine_argmax_phase_batch,
        sample_tags_bilinear,
    )

    b, p_cap, k, _ = grouped_joints.shape
    h4, w4 = avg_phase.shape[-2:]
    h, w = 4 * h4, 4 * w4

    score = grouped_joints[..., 2]  # [B, P, K]
    det = score > 0.0
    xi = jnp.clip(grouped_joints[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(grouped_joints[..., 1].astype(jnp.int32), 0, h - 1)
    # sample at integer joint coords of the virtual upsampled tag map
    ys_km = jnp.swapaxes(yi, 1, 2).reshape(b, k, p_cap)
    xs_km = jnp.swapaxes(xi, 1, 2).reshape(b, k, p_cap)
    det_tags = jax.vmap(
        lambda tl, ys, xs: sample_tags_bilinear(tl, ys, xs, h, w)
    )(tags_lo, ys_km, xs_km)  # [B, K, P, E]
    det_tags = jnp.swapaxes(det_tags, 1, 2)  # [B, P, K, E]
    n_det = jnp.maximum(det.sum(axis=2), 1.0)  # [B, P]
    prev_tag = (
        jnp.sum(jnp.where(det[..., None], det_tags, 0.0), axis=2) / n_det[..., None]
    )  # [B, P, E]

    idx_bkp, _ = refine_argmax_phase_batch(avg_phase, tags_lo, prev_tag, interpret)
    flat_idx = jnp.transpose(idx_bkp, (0, 2, 1))  # [B, P, K]

    bb = jnp.arange(b)[:, None, None]
    kk = jnp.broadcast_to(jnp.arange(k)[None, None, :], (b, p_cap, k))
    fy = (flat_idx // w).astype(jnp.int32)
    fx = (flat_idx % w).astype(jnp.int32)

    def g(ys, xs):
        return jax.vmap(phase_gather)(avg_phase, kk, ys, xs)

    val = g(fy, fx)
    right = g(fy, jnp.minimum(fx + 1, w - 1))
    left = g(fy, jnp.maximum(fx - 1, 0))
    down = g(jnp.minimum(fy + 1, h - 1), fx)
    up = g(jnp.maximum(fy - 1, 0), fx)
    new_x = fx.astype(jnp.float32) + 0.5 + jnp.where(right > left, 0.25, -0.25)
    new_y = fy.astype(jnp.float32) + 0.5 + jnp.where(down > up, 0.25, -0.25)

    replace = (val > 0.0) & (score == 0.0) & (det.sum(axis=2, keepdims=True) > 0)
    out = grouped_joints.at[..., 0].set(
        jnp.where(replace, new_x, grouped_joints[..., 0])
    )
    out = out.at[..., 1].set(jnp.where(replace, new_y, grouped_joints[..., 1]))
    out = out.at[..., 2].set(jnp.where(replace, val, grouped_joints[..., 2]))
    return out


@functools.partial(
    jax.jit, static_argnames=("max_num_people", "det_thr", "tag_thr", "do_adjust", "do_refine")
)
def parse_batch(
    kpts_hms: jnp.ndarray,
    tags_hms: jnp.ndarray,
    max_num_people: int = 30,
    det_thr: float = 0.1,
    tag_thr: float = 1.0,
    do_adjust: bool = True,
    do_refine: bool = True,
):
    """Batched full decode (reference grouping.py:252-283 per image).

    Args:
      kpts_hms: [B, K, H, W] float32 averaged keypoint heatmaps
      tags_hms: [B, K, H, W, E] float32 tag embeddings (E=2 with flip TTA)

    Returns:
      joints [B, P, K, 3+E] (x, y, score, tags), person_scores [B, P],
      valid [B, P]

    On TPU the sequential grouping and the refine pass run as Pallas kernels
    (ops/pallas_match.py, ops/pallas_decode.py) with the batch on the kernel
    grid; elsewhere the vmapped XLA formulations are used (identical results).
    """
    b, k, h, w = kpts_hms.shape
    e = tags_hms.shape[-1]
    m = max_num_people
    tags_k, coords_k, scores_k = jax.vmap(
        lambda kh, th: top_k(kh, th, m)
    )(kpts_hms, tags_hms)  # [B,K,M,E], [B,K,M,2], [B,K,M]

    grouped, valid = group_from_candidates(
        tags_k, coords_k, scores_k,
        det_thr=det_thr, tag_thr=tag_thr, use_pallas=_use_pallas(h, w),
    )

    if do_adjust:
        grouped = jax.vmap(adjust)(grouped, kpts_hms)
    person_scores = grouped[..., 2].mean(axis=2)
    if do_refine:
        grouped = refine_batch(kpts_hms, tags_hms, grouped)
    return grouped, person_scores, valid


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
    """Single-image decode (reference grouping.py:252-283): see parse_batch."""
    joints, scores, valid = parse_batch(
        kpts_hms[None], tags_hms[None],
        max_num_people=max_num_people, det_thr=det_thr, tag_thr=tag_thr,
        do_adjust=do_adjust, do_refine=do_refine,
    )
    return joints[0], scores[0], valid[0]

"""Pallas TPU kernel for the sequential AE-tag grouping (match_by_tag).

The grouping algorithm (reference grouping.py:85-145) is inherently
sequential: joints are processed in a fixed order, each step solving a
~30x30 assignment between new detections and the persons accumulated so far.
Expressed in XLA this costs thousands of tiny while-loop iterations with
~microseconds of loop overhead each (5-25 ms/image); on-core the same math is
nanoseconds per step. This kernel runs the ENTIRE grouping — cost matrices,
the shortest-augmenting-path Hungarian with row/column potentials, threshold
gating, person-slot bookkeeping — for one image per grid cell, entirely in
VMEM/registers.

Layout conventions (everything tiny, padded to TPU tiles):
  candidates m on SUBLANES (padded to 32), persons p on LANES (lane p),
  lane 127 is the Hungarian's virtual column. Column->row "transposes" and
  dynamic lane placement are eye/select matmuls on the MXU; scalar extraction
  uses masked reductions.

The reference's separate "seed" path (first joint with detections,
grouping.py:107-111) is folded into the general path: with zero persons every
column is padding, the assignment matches nothing, and all valid candidates
become new persons in candidate order — byte-identical bookkeeping.

Semantics match the fixed-slot formulation of ops/grouping.py:
  * costs round(dist)*100 - score, nonexistent-person columns padded with an
    equal constant just above the max real cost (exactly equivalent to the
    reference's f64 1e10 padding, but f32-safe — see grouping.py match())
  * rows below det_thr are skipped (predicated), preserving candidate order
  * assignment accepted iff raw tag distance < tag_thr, else the candidate
    seeds a new person (in candidate order), capacity P
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 32  # candidate sublane padding
VCOL = LANES - 1  # virtual Hungarian column
_INF = 1e18  # python floats: jnp scalars would be captured consts in the kernel


def _match_kernel(order_ref, cand_ref, joints_ref, count_ref, *, K, M, E, F, P,
                  det_thr, tag_thr):
    row_i = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    lane_1 = lane_i[0:1]  # [1, LANES]
    row_col = row_i[:, 0:1]  # [SUB, 1]
    eye = (row_i == lane_i).astype(jnp.float32)  # [SUB, LANES]
    ones_col = jnp.ones((SUB, 1), jnp.float32)
    # NOTE: full-LANES triangular matrix — a [SUB, SUB] (32-lane) matmul LHS
    # crashes the Mosaic compiler on v5e
    tri128 = ((lane_i <= row_i) & (lane_i < SUB)).astype(jnp.float32)

    def col2row(col):  # [SUB, 1] f32 -> [1, LANES]
        return jax.lax.dot_general(
            col, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        ).reshape(1, LANES)

    def lane_extract_i(vec, j):
        return jnp.sum(jnp.where(lane_1 == j, vec, 0)).astype(jnp.int32)

    def sublane_extract_f(col, i):
        return jnp.sum(jnp.where(row_col == i, col, 0.0))

    def cumsum_rows(col):  # inclusive cumsum along sublanes of [SUB,1] f32
        return jax.lax.dot_general(
            tri128, col2row(col), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )

    tag_window = lane_i < E
    order_row = order_ref[0]  # [1, LANES] i32 (first K lanes hold the order)

    def step(s, state):
        joints_state, tag_sum, tag_cnt, count = state
        idx = lane_extract_i(order_row, s)  # original joint id
        cand = cand_ref[0, s]  # [SUB, F]
        scores = cand[:, 2:3]  # [SUB, 1]
        valid = (scores > det_thr) & (row_col < M)
        validf = valid.astype(jnp.float32)
        tagsc = cand[:, 3 : 3 + E]  # [SUB, E]
        window = (lane_1 >= idx * F) & (lane_1 < idx * F + F)  # [1, LANES]
        # dynamic lane placement: placed = gathered @ S, S[f, l] = (l == idx*F+f)
        S = ((lane_i == idx * F + row_i) & (row_col < F)).astype(jnp.float32)[:F]

        def gather(sel_f):  # [m-sub, p-lane] -> ([p-sub, F], [p-sub, 1])
            g = jax.lax.dot_general(
                sel_f, cand, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )[:SUB]
            got = jax.lax.dot_general(
                sel_f, ones_col, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )[:SUB]
            return g, got

        def place_dyn(vals):  # [SUB, F] -> [SUB, LANES] at lanes idx*F..
            return jax.lax.dot_general(
                vals, S, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )

        def place_tags(vals):  # [SUB, E] -> [SUB, LANES] at lanes 0..E-1
            pad = jnp.zeros((SUB, LANES - E), jnp.float32)
            return jnp.concatenate([vals, pad], axis=1)

        safe_cnt = jnp.maximum(tag_cnt, 1.0)
        mean = tag_sum[:, :E] / safe_cnt  # [p-sub, E]

        # dist^2[m, p] = t^2 - 2 t.mu + mu^2, persons on lanes
        cross = jax.lax.dot_general(
            tagsc, mean, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )  # [m-sub, p(SUB lanes)]
        cross = jnp.concatenate(
            [cross, jnp.zeros((SUB, LANES - SUB), jnp.float32)], axis=1
        )
        t2 = jnp.sum(tagsc * tagsc, axis=1, keepdims=True)  # [SUB,1]
        mu2 = jnp.sum(mean * mean, axis=1, keepdims=True)  # [SUB,1]
        dist = jnp.sqrt(jnp.maximum(t2 - 2.0 * cross + col2row(mu2), 0.0))

        person_lane = lane_1 < count
        cost = jnp.round(dist) * 100.0 - scores
        # pad nonexistent-person columns JUST above the max real cost (any
        # equal constant above it is exactly equivalent to the reference's
        # f64 1e10 padding; a literal 1e10 corrupts the f32 JV potentials —
        # see ops/grouping.py match() for the argument)
        real = valid & person_lane
        max_real = jnp.max(jnp.where(real, cost, -_INF))
        pad = jnp.where(max_real > -_INF * 0.5, jnp.abs(max_real) * 2.0 + 100.0, 100.0)
        cost = jnp.where(person_lane, cost, pad)

        # ----- Hungarian: rows m predicated, cols on lanes -------------------
        u0 = jnp.zeros((SUB, 1), jnp.float32)
        v0 = jnp.zeros((1, LANES), jnp.float32)
        pm0 = jnp.zeros((1, LANES), jnp.int32)  # row+1 matched to col

        # NOTE Mosaic workarounds: masks are int32 (bool while-carries are
        # rejected); augmenting paths early-exit via while_loop.
        def assign_row(m, uvp):
            u0_, v0_, pm_ = uvp
            is_valid = jnp.sum(jnp.where(row_col == m, validf, 0.0)) > 0
            pm_ = jnp.where(is_valid & (lane_1 == VCOL), m + 1, pm_)

            def aug_cond(c):
                u, v, p_match, minv, used, way, j0 = c
                return is_valid & (lane_extract_i(p_match, j0) != 0)

            def aug_body(c):
                u, v, p_match, minv, used, way, j0 = c
                used = jnp.maximum(used, (lane_1 == j0).astype(jnp.int32))
                usedb = used > 0
                i0 = lane_extract_i(p_match, j0)  # row+1
                u_i0 = sublane_extract_f(u, i0 - 1)
                cost_i0 = jnp.sum(
                    jnp.where(row_col == i0 - 1, cost, 0.0),
                    axis=0, keepdims=True,
                )
                cur = jnp.where(lane_1 == VCOL, _INF, cost_i0 - u_i0 - v)
                upd = (~usedb) & (cur < minv)
                way = jnp.where(upd, j0, way)
                minv = jnp.where(upd, cur, minv)
                masked = jnp.where(usedb | (lane_1 == VCOL), _INF, minv)
                delta = jnp.min(masked)
                j1 = jnp.min(
                    jnp.where(masked == delta, lane_1, LANES)
                ).astype(jnp.int32)
                inc = jnp.max(
                    jnp.where((p_match == row_i + 1) & usedb, 1.0, 0.0),
                    axis=1, keepdims=True,
                )
                u = u + delta * inc
                v = jnp.where(usedb, v - delta, v)
                minv = jnp.where(usedb, minv, minv - delta)
                return u, v, p_match, minv, used, way, j1

            minv0 = jnp.full((1, LANES), _INF)
            used0 = jnp.zeros((1, LANES), jnp.int32)
            way0 = jnp.full((1, LANES), VCOL, jnp.int32)
            u, v, p_match, minv, used, way, j0 = jax.lax.while_loop(
                aug_cond, aug_body,
                (u0_, v0_, pm_, minv0, used0, way0, jnp.int32(VCOL)),
            )

            def back_cond(c):
                j0, p_match = c
                return j0 != VCOL

            def back_body(c):
                j0, p_match = c
                j1 = lane_extract_i(way, j0)
                pj1 = lane_extract_i(p_match, j1)
                p_match = jnp.where(lane_1 == j0, pj1, p_match)
                return j1, p_match

            j0, p_match = jax.lax.while_loop(back_cond, back_body, (j0, p_match))
            return u, v, p_match

        # dynamic row bound: candidates are score-sorted, so valid rows are a
        # prefix — run augmenting passes only up to the last valid row (a
        # no-op-free exit for sparse/real scenes; dense worst case unchanged).
        # Bounded by last-valid INDEX, not count, so it stays correct even if
        # validity were non-contiguous.
        n_rows = jnp.max(jnp.where(valid, row_col + 1, 0)).astype(jnp.int32)
        u, v, p_match = jax.lax.fori_loop(0, n_rows, assign_row, (u0, v0, pm0))

        # ----- harvest matches ------------------------------------------------
        assign = (p_match == row_i + 1) & (lane_1 != VCOL)
        matched = assign & (dist < tag_thr) & valid & person_lane
        matchedf = matched.astype(jnp.float32)
        gathered, got = gather(matchedf)
        joints_state = jnp.where((got > 0) & window, place_dyn(gathered), joints_state)
        tag_sum = jnp.where(
            (got > 0) & tag_window, tag_sum + place_tags(gathered[:, 3:3 + E]), tag_sum
        )
        tag_cnt = tag_cnt + got

        # ----- new persons for unmatched valid rows ---------------------------
        matched_row = jnp.max(matchedf, axis=1, keepdims=True)  # [SUB,1]
        new_rows = validf * (1.0 - matched_row)
        slots = (count + cumsum_rows(new_rows) - 1.0).astype(jnp.int32)
        sel = ((slots == lane_i) & (new_rows > 0) & (lane_i < P)).astype(jnp.float32)
        gathered_n, got_n = gather(sel)
        joints_state = jnp.where((got_n > 0) & window, place_dyn(gathered_n), joints_state)
        tag_sum = jnp.where((got_n > 0) & tag_window, place_tags(gathered_n[:, 3:3 + E]), tag_sum)
        tag_cnt = jnp.where(got_n > 0, 1.0, tag_cnt)
        count = jnp.minimum(count + jnp.sum(new_rows).astype(jnp.int32), P)
        return joints_state, tag_sum, tag_cnt, count

    init = (
        jnp.zeros((SUB, LANES), jnp.float32),  # joints_state [p, k*F+f]
        jnp.zeros((SUB, LANES), jnp.float32),  # tag_sum [p, e]
        jnp.zeros((SUB, 1), jnp.float32),  # tag_cnt
        jnp.int32(0),  # count
    )
    joints_state, tag_sum, tag_cnt, count = jax.lax.fori_loop(0, K, step, init)

    joints_ref[0] = joints_state[:P, : K * F]
    count_ref[0] = jnp.broadcast_to(count, (1, LANES)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# batched kernel: the whole batch in ONE grid cell
# ---------------------------------------------------------------------------
#
# The per-image kernel above runs the batch as sequential grid cells, so each
# image pays the full while-loop latency (the augmenting-path iteration count
# is the decode's latency driver: ~0.5 us of loop overhead per iteration).
# This variant stacks the batch on the leading dim of 3-D [B, SUB, LANES]
# values and predicates the Hungarian's while loops per image: the iteration
# count becomes the MAX over the batch instead of the SUM (measured ~4x faster
# at batch 8 on dense scenes).
#
# Layout differences vs the per-image kernel:
#   * person-indexed state (tag_sum/tag_cnt) lives on LANES as [B, 1, LANES]
#     rows, so the matched-harvest is an axis-1 (sublane) reduction — no
#     cross-sublane transposes anywhere.
#   * grouped joints accumulate LANE-major as [B, K*F (sublanes), P (lanes)];
#     the [B, P, K, F] output transpose happens outside the kernel in XLA.
#   * `row_used` (rows matched to a visited column) is maintained
#     incrementally instead of recomputed from p_match, saving a
#     [B, SUB, LANES] sweep per augmenting iteration.
#   * per-image cumsum over sublanes (new-person slots) uses masked
#     pltpu.roll doubling instead of a triangular matmul.


def _match_kernel_batched(order_ref, cand_ref, joints_ref, count_ref, *,
                          B, K, M, E, F, P, det_thr, tag_thr, unroll=1):
    kfs = joints_ref.shape[1]  # K*F padded to a sublane multiple
    rrow = jax.lax.broadcasted_iota(jnp.int32, (B, SUB, LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, SUB, LANES), 2)
    rrow_c = rrow[:, :, 0:1]  # [B, SUB, 1]
    lane_r = lane[:, 0:1, :]  # [B, 1, LANES]
    krow = jax.lax.broadcasted_iota(jnp.int32, (B, kfs, LANES), 1)
    lane_2d = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    order_row = order_ref[0]  # [1, LANES] i32

    def step(s, state):
        joints_lane, tag_sums, tag_cnt, count = state
        idx = jnp.sum(jnp.where(lane_2d == s, order_row, 0))  # original joint id
        cand = cand_ref[:, s]  # [B, SUB, F]
        scores = cand[:, :, 2:3]  # [B, SUB, 1]
        valid = (scores > det_thr) & (rrow_c < M)
        validf = valid.astype(jnp.float32)
        cand_tags = [cand[:, :, 3 + e : 4 + e] for e in range(E)]  # [B, SUB, 1] each

        safe_cnt = jnp.maximum(tag_cnt, 1.0)  # [B, 1, LANES]
        d2 = jnp.zeros((B, SUB, LANES), jnp.float32)
        for e in range(E):
            diff = cand_tags[e] - tag_sums[e] / safe_cnt  # [B, SUB, LANES]
            d2 = d2 + diff * diff
        dist = jnp.sqrt(d2)

        person_lane = lane_r < count  # [B, 1, LANES]
        cost = jnp.round(dist) * 100.0 - scores
        # per-image dynamic pad just above the max real cost (see the
        # per-image kernel / ops/grouping.py match() for why a literal 1e10
        # breaks f32 JV optimality)
        real = valid & person_lane
        max_real = jnp.max(
            jnp.max(jnp.where(real, cost, -_INF), axis=2, keepdims=True),
            axis=1, keepdims=True,
        )  # [B, 1, 1]
        pad = jnp.where(max_real > -_INF * 0.5, jnp.abs(max_real) * 2.0 + 100.0, 100.0)
        cost = jnp.where(person_lane, cost, pad)

        # ----- Hungarian: rows on sublanes, columns on lanes, per-image ------
        u0 = jnp.zeros((B, SUB, 1), jnp.float32)
        v0 = jnp.zeros((B, 1, LANES), jnp.float32)
        pm0 = jnp.zeros((B, 1, LANES), jnp.int32)  # row+1 matched to col

        def assign_row(m, uvp):
            u, v, pm = uvp
            is_valid = jnp.sum(
                jnp.where(rrow_c == m, validf, 0.0), axis=1, keepdims=True
            ) > 0.0  # [B, 1, 1]
            pm = jnp.where(is_valid & (lane_r == VCOL), m + 1, pm)

            def aug_cond(c):
                u, v, pm, minv, used, way, row_used, j0 = c
                p_j0 = jnp.sum(jnp.where(lane_r == j0, pm, 0), axis=2, keepdims=True)
                return jnp.max(jnp.where(is_valid, p_j0, 0)) != 0

            def aug_body(c):
                u, v, pm, minv, used, way, row_used, j0 = c
                p_j0 = jnp.sum(jnp.where(lane_r == j0, pm, 0), axis=2, keepdims=True)
                act = is_valid & (p_j0 != 0)  # [B, 1, 1]
                used = jnp.where(act & (lane_r == j0), 1, used)
                i0 = p_j0  # row+1 of the row matched to column j0
                row_used = jnp.where(act & (rrow_c == i0 - 1), 1, row_used)
                cost_i0 = jnp.sum(
                    jnp.where(rrow == i0 - 1, cost, 0.0), axis=1, keepdims=True
                )  # [B, 1, LANES]
                u_i0 = jnp.sum(
                    jnp.where(rrow_c == i0 - 1, u, 0.0), axis=1, keepdims=True
                )  # [B, 1, 1]
                cur = jnp.where(lane_r == VCOL, _INF, cost_i0 - u_i0 - v)
                upd = act & (used == 0) & (cur < minv)
                way = jnp.where(upd, j0, way)
                minv = jnp.where(upd, cur, minv)
                masked = jnp.where((used > 0) | (lane_r == VCOL), _INF, minv)
                delta = jnp.min(masked, axis=2, keepdims=True)  # [B, 1, 1]
                j1 = jnp.min(
                    jnp.where(masked == delta, lane_r, LANES), axis=2, keepdims=True
                ).astype(jnp.int32)
                actf = act.astype(jnp.float32)
                u = u + delta * row_used.astype(jnp.float32) * actf
                v = jnp.where(act & (used > 0), v - delta, v)
                minv = jnp.where(act & (used == 0), minv - delta, minv)
                j0 = jnp.where(act, j1, j0)
                return u, v, pm, minv, used, way, row_used, j0

            def aug_body_unrolled(c):
                # aug_body is a per-image no-op once that image's path has
                # terminated (everything is predicated on act), so running it
                # `unroll` times per while_loop trip preserves semantics
                # exactly while dividing the Mosaic loop-machinery overhead —
                # the decode latency driver on dense scenes.
                for _ in range(unroll):
                    c = aug_body(c)
                return c

            minv0 = jnp.full((B, 1, LANES), _INF, jnp.float32)
            used0 = jnp.zeros((B, 1, LANES), jnp.int32)
            way0 = jnp.full((B, 1, LANES), VCOL, jnp.int32)
            row_used0 = jnp.zeros((B, SUB, 1), jnp.int32)
            j00 = jnp.full((B, 1, 1), VCOL, jnp.int32)
            u, v, pm, minv, used, way, row_used, j0 = jax.lax.while_loop(
                aug_cond, aug_body_unrolled,
                (u, v, pm, minv0, used0, way0, row_used0, j00)
            )

            def back_cond(c):
                j0, pm = c
                # any(j0 != VCOL): reduce an indicator — a direct max over j0
                # would be masked by finished images (VCOL is the max lane)
                return jnp.max(jnp.where(is_valid & (j0 != VCOL), 1, 0)) > 0

            def back_body(c):
                j0, pm = c
                act = is_valid & (j0 != VCOL)
                j1 = jnp.sum(jnp.where(lane_r == j0, way, 0), axis=2, keepdims=True)
                pj1 = jnp.sum(jnp.where(lane_r == j1, pm, 0), axis=2, keepdims=True)
                pm = jnp.where(act & (lane_r == j0), pj1, pm)
                j0 = jnp.where(act, j1, j0)
                return j0, pm

            _, pm = jax.lax.while_loop(back_cond, back_body, (j0, pm))
            return u, v, pm

        # dynamic row bound (see the per-image kernel): batch-max index of the
        # last above-threshold candidate — sparse/real scenes skip the empty
        # row tail entirely; dense worst case unchanged.
        n_rows = jnp.max(jnp.where(valid, rrow_c + 1, 0)).astype(jnp.int32)
        _, _, pm = jax.lax.fori_loop(0, n_rows, assign_row, (u0, v0, pm0))

        # ----- harvest matches (all reductions along sublanes) ---------------
        assign = (pm == rrow + 1) & (lane != VCOL)  # [B, SUB, LANES]
        matched = assign & (dist < tag_thr) & valid & person_lane
        matchedf = matched.astype(jnp.float32)
        got = jnp.sum(matchedf, axis=1, keepdims=True)  # [B, 1, LANES]
        vals = [
            jnp.sum(matchedf * cand[:, :, f : f + 1], axis=1, keepdims=True)
            for f in range(F)
        ]  # each [B, 1, LANES]
        for f in range(F):
            joints_lane = jnp.where(
                (krow == idx * F + f) & (got > 0.0), vals[f], joints_lane
            )
        tag_sums = [tag_sums[e] + vals[3 + e] for e in range(E)]
        tag_cnt = tag_cnt + got

        # ----- new persons for unmatched valid rows ---------------------------
        matched_row = jnp.max(matchedf, axis=2, keepdims=True)  # [B, SUB, 1]
        new_rows = validf * (1.0 - matched_row)
        cum = new_rows
        for sh in (1, 2, 4, 8, 16):
            cum = cum + jnp.where(rrow_c >= sh, pltpu.roll(cum, sh, 1), 0.0)
        slots = (count.astype(jnp.float32) + cum - 1.0).astype(jnp.int32)  # [B, SUB, 1]
        sel = ((slots == lane) & (new_rows > 0.0) & (lane < P)).astype(jnp.float32)
        got_n = jnp.sum(sel, axis=1, keepdims=True)  # [B, 1, LANES]
        vals_n = [
            jnp.sum(sel * cand[:, :, f : f + 1], axis=1, keepdims=True)
            for f in range(F)
        ]
        for f in range(F):
            joints_lane = jnp.where(
                (krow == idx * F + f) & (got_n > 0.0), vals_n[f], joints_lane
            )
        tag_sums = [
            jnp.where(got_n > 0.0, vals_n[3 + e], tag_sums[e]) for e in range(E)
        ]
        tag_cnt = jnp.where(got_n > 0.0, 1.0, tag_cnt)
        new_cnt = jnp.sum(new_rows, axis=1, keepdims=True).astype(jnp.int32)
        count = jnp.minimum(count + new_cnt, P)
        return joints_lane, tag_sums, tag_cnt, count

    init = (
        jnp.zeros((B, kfs, LANES), jnp.float32),  # joints, lane-major
        [jnp.zeros((B, 1, LANES), jnp.float32) for _ in range(E)],
        jnp.zeros((B, 1, LANES), jnp.float32),  # tag_cnt
        jnp.zeros((B, 1, 1), jnp.int32),  # count
    )
    joints_lane, _, _, count = jax.lax.fori_loop(0, K, step, init)
    joints_ref[...] = joints_lane
    count_ref[...] = jnp.broadcast_to(count, (B, 1, LANES))


@functools.partial(
    jax.jit,
    static_argnames=(
        "det_thr", "tag_thr", "joints_order", "num_persons", "interpret", "unroll"
    ),
)
def match_by_tag_pallas_batched(
    cand_ordered: jnp.ndarray,
    det_thr: float = 0.1,
    tag_thr: float = 1.0,
    joints_order: tuple = (),
    num_persons: int | None = None,
    interpret: bool = False,
    unroll: int = 1,
):
    """Batched-in-one-grid-cell variant of :func:`match_by_tag_pallas`.

    Same args and results; prefer this on TPU — the augmenting-path loops are
    shared across the batch (predicated per image), so decode latency scales
    with the max iteration count over the batch instead of the sum.

    ``unroll`` runs the augmenting-path body that many times per while_loop
    trip (exact: the body is a per-image no-op after termination); >1 trades
    up to unroll-1 wasted body evaluations for fewer Mosaic loop-condition
    round trips on dense scenes.
    """
    b, k, m, f = cand_ordered.shape
    e = f - 3
    p = num_persons or m
    assert m <= SUB and p <= VCOL
    assert len(joints_order) == k

    if m < SUB:  # pad candidates to the sublane tile
        cand_ordered = jnp.concatenate(
            [cand_ordered, jnp.zeros((b, k, SUB - m, f), cand_ordered.dtype)], axis=2
        )
    order_arr = jnp.zeros((1, LANES), jnp.int32).at[0, :k].set(
        jnp.asarray(joints_order, jnp.int32)
    )
    kfs = -(-(k * f) // 8) * 8  # joints sublane dim padded to the f32 tile

    kernel = functools.partial(
        _match_kernel_batched,
        B=b, K=k, M=m, E=e, F=f, P=p, det_thr=det_thr, tag_thr=tag_thr,
        unroll=unroll,
    )
    joints_lane, cnt = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((1, LANES), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k, SUB, f), lambda: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, kfs, LANES), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, LANES), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, kfs, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(order_arr, cand_ordered.astype(jnp.float32))
    # [B, K*F (sublanes), P (lanes)] -> [B, P, K, F] in XLA (tiny)
    joints = jnp.transpose(joints_lane[:, : k * f, :p], (0, 2, 1)).reshape(b, p, k, f)
    return joints, cnt[:, 0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("det_thr", "tag_thr", "joints_order", "num_persons", "interpret"),
)
def match_by_tag_pallas(
    cand_ordered: jnp.ndarray,
    det_thr: float = 0.1,
    tag_thr: float = 1.0,
    joints_order: tuple = (),
    num_persons: int | None = None,
    interpret: bool = False,
):
    """Args:
      cand_ordered: [B, K, M, F] candidates ALREADY permuted to processing
        order along K (F = 3+E: x, y, score, tags...); joints_order[step]
        gives the original joint id for output placement.

    Returns:
      joints [B, P, K, F] float32, count [B] int32.
    """
    b, k, m, f = cand_ordered.shape
    e = f - 3
    p = num_persons or m
    assert m <= SUB and p <= VCOL and k * f <= LANES
    assert len(joints_order) == k

    if m < SUB:  # pad candidates to the sublane tile
        cand_ordered = jnp.concatenate(
            [cand_ordered, jnp.zeros((b, k, SUB - m, f), cand_ordered.dtype)], axis=2
        )
    order_arr = jnp.zeros((1, LANES), jnp.int32).at[0, :k].set(
        jnp.asarray(joints_order, jnp.int32)
    )

    kernel = functools.partial(
        _match_kernel, K=k, M=m, E=e, F=f, P=p, det_thr=det_thr, tag_thr=tag_thr
    )
    joints_flat, cnt = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, SUB, f), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, k * f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, p, k * f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(order_arr, cand_ordered.astype(jnp.float32))
    return joints_flat.reshape(b, p, k, f), cnt[:, 0, 0]

"""Pallas TPU kernels for the keypoint decode hot spots.

``refine_argmax``: for each joint k and person p, find
``argmax_yx( hm[k] - round(||tags[k] - prev_tag[p]||) )`` and the heatmap
value there — the refine pass of the AE decode (reference
grouping.py:216-229).

The naive XLA formulation re-reads the [K, H, W] tag/heatmap stacks once per
person (P x HBM traffic) and serializes full-map reductions. This kernel
streams one joint's maps through VMEM in row tiles, computes the quantized
tag-distance surface for ALL persons per tile on the VPU, and keeps lane-wise
running (max, first-argmax, value) accumulators — one HBM read total, with
argmax tie-breaking identical to np.argmax (first position in row-major
order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pick_row_tile(rows: int) -> int:
    for tr in (128, 64, 32, 16, 8, 4, 2, 1):
        if rows % tr == 0:
            return tr
    return 1


def _refine_kernel(cnt_ref, hm_ref, tags_ref, prev_ref, idx_ref, *, P, E, HW, TR):
    """One person-CHUNK of the refine argmax (grid = (b, k, person_chunk)).

    The grouped person count is usually far below the static cap (GT-like
    scenes group ~6 of 30): chunks whose first person index is past this
    image's count skip the P x HW distance scan entirely (the refine caller
    masks those persons out anyway — their scores are 0 and they have no
    detected joints, so their argmax is never consumed)."""
    rows = HW // LANES
    T = rows // TR
    ci = pl.program_id(2)
    # cnt is the WHOLE [B, 1] array in SMEM (Mosaic requires SMEM blocks to
    # match the array dims); index this image's count by grid position
    count = cnt_ref[pl.program_id(0), 0]
    prev = prev_ref[0]  # [P, E] (chunk slice)
    neg_inf = jnp.float32(-jnp.inf)

    @pl.when(ci * P >= count)
    def _skip():
        idx_ref[0, 0, 0, 0, :] = jnp.zeros((P,), jnp.int32)

    @pl.when(ci * P < count)
    def _run():
        _refine_chunk(hm_ref, tags_ref, prev, idx_ref, P=P, E=E, HW=HW, TR=TR)


def _refine_chunk(hm_ref, tags_ref, prev, idx_ref, *, P, E, HW, TR):
    rows = HW // LANES
    T = rows // TR
    neg_inf = jnp.float32(-jnp.inf)

    best_diff = jnp.full((P, LANES), neg_inf, jnp.float32)
    best_row = jnp.zeros((P, LANES), jnp.int32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (P, TR, LANES), 1)

    def tile_body(t, carry):
        best_diff, best_row = carry
        hm_t = hm_ref[0, 0, pl.ds(t * TR, TR), :]  # [TR, LANES]
        if E == 1:
            # single embedding dim: ||d|| = |d| — no square/sqrt needed
            tg = tags_ref[0, 0, 0, pl.ds(t * TR, TR), :]
            dist = jnp.abs(tg[None, :, :] - prev[:, 0][:, None, None])
        else:
            acc = jnp.zeros((P, TR, LANES), jnp.float32)
            for e in range(E):  # static tiny loop
                tg = tags_ref[0, 0, e, pl.ds(t * TR, TR), :]
                d = tg[None, :, :] - prev[:, e][:, None, None]
                acc = acc + d * d
            dist = jnp.sqrt(acc)
        diff = hm_t[None] - jnp.round(dist)  # [P, TR, LANES]
        tmax = jnp.max(diff, axis=1)  # [P, LANES]
        # first row attaining the per-lane max
        trow = jnp.min(
            jnp.where(diff == tmax[:, None, :], row_iota, TR), axis=1
        )  # [P, LANES]
        better = tmax > best_diff  # strict: earlier tile wins ties
        best_row = jnp.where(better, trow + t * TR, best_row)
        best_diff = jnp.where(better, tmax, best_diff)
        return best_diff, best_row

    best_diff, best_row = jax.lax.fori_loop(0, T, tile_body, (best_diff, best_row))

    # resolve across lanes: smallest linear index among global maxima
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (P, LANES), 1)
    lin = best_row * LANES + lane_iota
    m = jnp.max(best_diff, axis=1, keepdims=True)  # [P, 1]
    idx = jnp.min(jnp.where(best_diff == m, lin, HW), axis=1)  # [P]
    idx_ref[0, 0, 0, 0, :] = idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def refine_argmax(hm: jnp.ndarray, tags: jnp.ndarray, prev: jnp.ndarray, interpret: bool = False):
    """Single-image wrapper. See refine_argmax_batch.

    Args:
      hm:   [K, HW] float32 keypoint heatmaps (flattened spatial)
      tags: [K, E, HW] float32 tag maps
      prev: [P, E] float32 per-person mean tags

    Returns:
      (idx [K, P] int32 flat argmax positions, val [K, P] float32 heatmap
      values at those positions)
    """
    idx, val = refine_argmax_batch(hm[None], tags[None], prev[None], interpret=interpret)
    return idx[0], val[0]


PERSON_CHUNK = 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def refine_argmax_batch(
    hm: jnp.ndarray,
    tags: jnp.ndarray,
    prev: jnp.ndarray,
    counts: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Batched refine argmax; batch, joint, and person-chunk on the grid.

    Args:
      hm:   [B, K, HW] float32
      tags: [B, K, E, HW] float32
      prev: [B, P, E] float32
      counts: optional [B] int32 — per-image skip bound on the person axis:
        chunks whose FIRST person index is >= counts[b] skip their scan and
        emit idx=0 for every person in the chunk. CONTRACT: callers must not
        consume the argmax of any person slot >= counts[b] (skipped slots
        get idx=0 / val=hm[...,0], which is garbage for a real person).
        ``refine_batch`` satisfies this by deriving counts as
        (last person slot with any detected joint)+1, which is safe for any
        slot layout. None = process all P.

    Returns:
      (idx [B, K, P] int32, val [B, K, P] float32)
    """
    b, k, hw = hm.shape
    e = tags.shape[2]
    p = prev.shape[1]
    assert hw % LANES == 0, f"HW={hw} must be a multiple of {LANES}"
    rows = hw // LANES
    tr = _pick_row_tile(rows)

    pc = min(PERSON_CHUNK, p)
    n_chunks = -(-p // pc)
    p_pad = n_chunks * pc
    if p_pad != p:
        prev = jnp.pad(prev, ((0, 0), (0, p_pad - p), (0, 0)))
    if counts is None:
        cnt = jnp.full((b, 1), p, jnp.int32)
    else:
        cnt = counts.astype(jnp.int32).reshape(b, 1)

    hm4 = hm.reshape(b, k, rows, LANES)
    tags5 = tags.reshape(b, k, e, rows, LANES)
    kernel = functools.partial(_refine_kernel, P=pc, E=e, HW=hw, TR=tr)
    idx = pl.pallas_call(
        kernel,
        grid=(b, k, n_chunks),
        in_specs=[
            pl.BlockSpec((b, 1), lambda bi, ki, ci: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rows, LANES), lambda bi, ki, ci: (bi, ki, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e, rows, LANES), lambda bi, ki, ci: (bi, ki, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc, e), lambda bi, ki, ci: (bi, ci, 0), memory_space=pltpu.VMEM),
        ],
        # chunk dim is its own (size-1-block) axis: Mosaic requires the LAST
        # block dim to be 128-divisible or equal to the array dim
        out_specs=pl.BlockSpec((1, 1, 1, 1, pc), lambda bi, ki, ci: (bi, ki, ci, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, n_chunks, 1, pc), jnp.int32),
        interpret=interpret,
    )(cnt, hm4, tags5, prev)
    idx = idx.reshape(b, k, p_pad)[:, :, :p]
    # the heatmap value at the argmax: cheap XLA gather (the kernel used to
    # extract it in-VMEM, costing two extra passes per tile for a value the
    # refine caller re-gathers anyway)
    val = jnp.take_along_axis(hm, idx, axis=2)
    return idx, val

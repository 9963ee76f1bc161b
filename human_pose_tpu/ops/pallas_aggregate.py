"""Fused Pallas TPU pipeline for the decode's dense pre-grouping stages.

The reference decode (src/keypoints/results.py:225-234 + grouping.py:74-83)
upsamples the quarter-res stage to half res, averages with the half-res
stage, upsamples the average to input size, 5x5-maxpool-NMS-suppresses it,
and top-k's the suppressed map. Composed from XLA ops that chain costs
~1.0 ms/img on v5e — ~8x off the HBM roofline — because each step
materializes a full [K, H, W] tensor (and the bilinear resizes lower as
dense interpolation-matrix contractions).

This kernel computes the whole chain in ONE pass per (batch, joint) grid
cell, entirely in VMEM, exploiting that both upsamples are integer-factor
(2x then 2x) torch-style ``align_corners=False`` resizes with DYADIC phase
weights. Everything is expressed in **phase space**: a [H, W] map at scale
4f is represented as 4x4 phase planes ``F[ry][rx][i, j] = M[4i+ry, 4j+rx]``
of shape [H/4, W/4]. In that representation

* 2x bilinear upsampling is per-phase shifted 2-tap lerps (sublane/lane
  rolls + selects) — no interleave, no gather;
* the separable 5x5 NMS window is a static set of phase-shifted maxes;
* per-row chunk maxima (feeding the exact hierarchical top-k,
  grouping._chunked_top_k with chunk = one image row) are plain lane
  reductions.

Numerics are BIT-EXACT vs the XLA formulation: each output element is the
same two-tap fp32 lerp sequence (H then W, edge taps collapsing to an exact
copy — matching jax.image.resize's normalized edge weights), the same
(a+b)*0.5 average, the same max/compare NMS.

Outputs stay in phase layout; the downstream top-k gathers, quarter-offset
``adjust``, and the phase-layout refine kernel index it directly, so the
dense x-ordered [K, H, W] map is never materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


def _shift(x, d, axis):
    """Shifted copy along ``axis``: row i of the result is ``x[i - d]``
    (cyclic; callers mask the wrapped edge). pltpu.roll wants d >= 0."""
    return pltpu.roll(x, d % x.shape[axis], axis)


def _up2_phases(ps: list, axis: int):
    """One 2x ``align_corners=False`` upsample along ``axis`` in phase space.

    ``ps`` is a list of n phase planes of a map M of extent n*R along
    ``axis`` (M[n*i + phi] = ps[phi][i]). Returns the 2n phase planes of the
    2x-upsampled map: out[2u] = 0.25*M[u-1] + 0.75*M[u] and
    out[2u+1] = 0.75*M[u] + 0.25*M[u+1], with the edge taps collapsing to an
    exact copy (jax.image.resize normalizes the out-of-range tap away).
    Output phase order: out phase (2*phi + s) comes from input phase phi.
    """
    n = len(ps)
    out = [None] * (2 * n)
    shape = ps[0].shape
    i_ax = _iota(shape, axis)
    last = shape[axis] - 1
    for phi in range(n):
        p = ps[phi]
        prev = ps[phi - 1] if phi > 0 else _shift(ps[n - 1], 1, axis)
        nxt = ps[phi + 1] if phi < n - 1 else _shift(ps[0], -1, axis)
        even = 0.25 * prev + 0.75 * p
        if phi == 0:  # u == 0 edge: exact copy
            even = jnp.where(i_ax == 0, p, even)
        odd = 0.75 * p + 0.25 * nxt
        if phi == n - 1:  # u == last edge
            odd = jnp.where(i_ax == last, p, odd)
        out[2 * phi] = even
        out[2 * phi + 1] = odd
    return out


# 4x upsample taps (direct, NOT 2x twice): out[4i+r] phase taps/weights.
# r=0,1 tap (i-1, i); r=2,3 tap (i, i+1); edges collapse to a copy.
_UP4_W = ((0.375, 0.625), (0.125, 0.875), (0.875, 0.125), (0.625, 0.375))


def _up4_single(x, axis: int):
    """Direct 4x ``align_corners=False`` upsample of one plane along
    ``axis``, as 4 phase planes (used for the quarter-res tag maps)."""
    shape = x.shape
    i_ax = _iota(shape, axis)
    last = shape[axis] - 1
    prev = _shift(x, 1, axis)
    nxt = _shift(x, -1, axis)
    out = []
    for r, (wl, wr) in enumerate(_UP4_W):
        if r < 2:
            o = wl * prev + wr * x
            o = jnp.where(i_ax == 0, x, o)
        else:
            o = wl * x + wr * nxt
            o = jnp.where(i_ax == last, x, o)
        out.append(o)
    return out


def _nms_phase(F, axis: int, window: int = 5):
    """One separable max-pool pass over the 4-phase representation along
    ``axis`` (out-of-map neighbors = -inf, like lax.reduce_window)."""
    half = window // 2
    shape = F[0].shape
    i_ax = _iota(shape, axis)
    last = shape[axis] - 1
    neg = jnp.float32(-jnp.inf)
    out = []
    for r in range(4):
        acc = None
        for d in range(-half, half + 1):
            s = r + d
            c = s // 4  # floor division: block shift
            src = F[s % 4]
            if c == -1:
                v = jnp.where(i_ax == 0, neg, _shift(src, 1, axis))
            elif c == 1:
                v = jnp.where(i_ax == last, neg, _shift(src, -1, axis))
            else:
                v = src
            acc = v if acc is None else jnp.maximum(acc, v)
        out.append(acc)
    return out


def _aggregate_kernel(q_ref, h2p_ref, avg_ref, sup_ref, cmax_ref):
    q = q_ref[0, 0]  # [H4, W4]

    # stage-0 quarter map -> half res (phase space), H (sublanes) then W
    a_row = _up2_phases([q], axis=0)  # 2 phases over rows
    A = [_up2_phases([a], axis=1) for a in a_row]  # A[py][px]

    # average with the half-res stage (pre-phase-decomposed on the XLA side)
    C = [[(A[py][px] + h2p_ref[0, 0, py, px]) * 0.5 for px in range(2)]
         for py in range(2)]

    # half res -> input res: 2x again, H then W. The row-phase list over the
    # half-res rows u (u = 2i + py) is [C[0][px], C[1][px]].
    Vcol = [_up2_phases([C[0][px], C[1][px]], axis=0) for px in range(2)]
    F = [[None] * 4 for _ in range(4)]
    for ry in range(4):
        cols = _up2_phases([Vcol[0][ry], Vcol[1][ry]], axis=1)
        for rx in range(4):
            F[ry][rx] = cols[rx]

    # NMS 5x5 (separable): vertical then horizontal max, keep-equal
    P1 = [_nms_phase([F[ry][rx] for ry in range(4)], axis=0)
          for rx in range(4)]  # P1[rx][ry]
    SUP = [[None] * 4 for _ in range(4)]
    for ry in range(4):
        pooled_row = _nms_phase([P1[rx][ry] for rx in range(4)], axis=1)
        for rx in range(4):
            pooled = pooled_row[rx]
            f = F[ry][rx]
            SUP[ry][rx] = jnp.where(pooled == f, f, 0.0)

    for ry in range(4):
        for rx in range(4):
            avg_ref[0, 0, ry, rx] = F[ry][rx]
            sup_ref[0, 0, ry, rx] = SUP[ry][rx]
        # per-image-row maxima (chunk = one row of the full-res map):
        # rows y = 4i + ry -> cmax[ry][i] = max over x
        cm = None
        for rx in range(4):
            m = jnp.max(SUP[ry][rx], axis=1)  # [H4]
            cm = m if cm is None else jnp.maximum(cm, m)
        cmax_ref[0, 0, ry] = cm


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_aggregate(q: jnp.ndarray, h2: jnp.ndarray, interpret: bool = False):
    """Aggregate + upsample + NMS + row-maxima, one fused pass.

    Args:
      q:  [B, K, H4, W4] float32 quarter-res heatmaps (channel-major)
      h2: [B, K, 2*H4, 2*W4] float32 half-res heatmaps

    Returns:
      avg_phase [B, K, 4, 4, H4, W4] — averaged+resized map, phase layout
        (value at (y, x) = avg_phase[..., y % 4, x % 4, y // 4, x // 4])
      sup_phase [B, K, 4, 4, H4, W4] — NMS-suppressed map, same layout
      cmax      [B, K, 4, H4]        — per-image-row maxima of sup
    """
    b, k, h4, w4 = q.shape
    assert h2.shape == (b, k, 2 * h4, 2 * w4), (q.shape, h2.shape)
    # phase-decompose the half-res stage with strided slices (cheap: 1/4 the
    # output pixels); stacked as [B, K, 2, 2, H4, W4]
    h2p = jnp.stack(
        [jnp.stack([h2[:, :, py::2, px::2] for px in range(2)], axis=2)
         for py in range(2)],
        axis=2,
    )

    avg, sup, cmax = pl.pallas_call(
        _aggregate_kernel,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec((1, 1, h4, w4), lambda bi, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, 2, h4, w4), lambda bi, ki: (bi, ki, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 4, 4, h4, w4), lambda bi, ki: (bi, ki, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, 4, h4, w4), lambda bi, ki: (bi, ki, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, h4), lambda bi, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, 4, 4, h4, w4), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 4, 4, h4, w4), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 4, h4), jnp.float32),
        ],
        interpret=interpret,
    )(q, h2p)
    return avg, sup, cmax


def _refine_phase_kernel(F_ref, tags_ref, prev_ref, idx_ref, val_ref, *, P, E, H4, W4):
    """Refine argmax over a phase-layout heatmap with the tag maps upsampled
    4x IN-KERNEL from quarter resolution (the dense [H, W] tag map is never
    materialized in HBM). Tie-breaking is exact np.argmax row-major-first via
    explicit (diff, linear-index) lexicographic carries — the phase scan
    order never leaks into the result."""
    W = 4 * W4
    prev = prev_ref[0]  # [P, E]
    neg_inf = jnp.float32(-jnp.inf)
    big = jnp.int32(4 * H4 * W)

    # 4x upsample each tag plane into 16 phase planes (rows then lanes)
    tag_up = [[[None] * E for _ in range(4)] for _ in range(4)]
    for e in range(E):
        rows = _up4_single(tags_ref[0, 0, e], axis=0)
        for ry in range(4):
            cols = _up4_single(rows[ry], axis=1)
            for rx in range(4):
                tag_up[ry][rx][e] = cols[rx]

    best_diff = jnp.full((P, W4), neg_inf, jnp.float32)
    best_lin = jnp.full((P, W4), big, jnp.int32)
    best_hm = jnp.zeros((P, W4), jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (P, H4, W4), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (P, W4), 1)

    for ry in range(4):
        for rx in range(4):
            hm_p = F_ref[0, 0, ry, rx]  # [H4, W4]
            acc = jnp.zeros((P, H4, W4), jnp.float32)
            for e in range(E):
                d = tag_up[ry][rx][e][None] - prev[:, e][:, None, None]
                acc = acc + d * d
            diff = hm_p[None] - jnp.round(jnp.sqrt(acc))  # [P, H4, W4]
            tmax = jnp.max(diff, axis=1)  # [P, W4]
            trow = jnp.min(
                jnp.where(diff == tmax[:, None, :], row_iota, H4), axis=1
            )  # [P, W4] first row attaining the per-lane max
            thm = jnp.max(
                jnp.where(row_iota == trow[:, None, :], hm_p[None], neg_inf),
                axis=1,
            )
            lin = (4 * trow + ry) * W + 4 * lane_iota + rx
            better = (tmax > best_diff) | ((tmax == best_diff) & (lin < best_lin))
            best_lin = jnp.where(better, lin, best_lin)
            best_hm = jnp.where(better, thm, best_hm)
            best_diff = jnp.where(better, tmax, best_diff)

    m = jnp.max(best_diff, axis=1, keepdims=True)  # [P, 1]
    idx = jnp.min(jnp.where(best_diff == m, best_lin, big), axis=1)  # [P]
    val = jnp.max(
        jnp.where(best_lin == idx[:, None], best_hm, neg_inf), axis=1
    )
    idx_ref[0, 0, 0, :] = idx
    val_ref[0, 0, 0, :] = val


@functools.partial(jax.jit, static_argnames=("interpret",))
def refine_argmax_phase_batch(
    avg_phase: jnp.ndarray,
    tags_lo: jnp.ndarray,
    prev: jnp.ndarray,
    interpret: bool = False,
):
    """Batched refine argmax on phase-layout heatmaps + quarter-res tags.

    Args:
      avg_phase: [B, K, 4, 4, H4, W4] float32 (fused_aggregate layout)
      tags_lo:   [B, K, E, H4, W4] float32 quarter-res tag maps
      prev:      [B, P, E] float32 per-person mean tags

    Returns:
      (idx [B, K, P] int32 — argmax positions as flat y*(4*W4)+x indices of
      the FULL-RES map, row-major first on ties like np.argmax; val [B, K, P]
      float32 heatmap values there)
    """
    b, k, _, _, h4, w4 = avg_phase.shape
    e = tags_lo.shape[2]
    p = prev.shape[1]
    kernel = functools.partial(_refine_phase_kernel, P=p, E=e, H4=h4, W4=w4)
    idx, val = pl.pallas_call(
        kernel,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec((1, 1, 4, 4, h4, w4), lambda bi, ki: (bi, ki, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e, h4, w4), lambda bi, ki: (bi, ki, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, e), lambda bi, ki: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, p), lambda bi, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda bi, ki: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, 1, p), jnp.int32),
            jax.ShapeDtypeStruct((b, k, 1, p), jnp.float32),
        ],
        interpret=interpret,
    )(avg_phase, tags_lo, prev)
    return idx[:, :, 0, :], val[:, :, 0, :]


def sample_tags_bilinear(tags_lo: jnp.ndarray, yy, xx, out_h: int, out_w: int):
    """Sample the 4x-upsampled tag surface at integer full-res (y, x) WITHOUT
    materializing it: two-tap lerp vertically then horizontally with the same
    dyadic phase weights the kernels use (edge taps collapse to a copy).

    tags_lo: [K, E, H4, W4]; yy/xx: [K, M] int. Returns [K, M, E].

    Values match the fused kernels' upsample bit-for-bit (same op sequence)
    and jax.image.resize to ~1 ulp (resize contracts both dims in one
    einsum whose association XLA picks freely).
    """
    k, e, h4, w4 = tags_lo.shape
    del out_h, out_w
    ry, rx = yy % 4, xx % 4
    iy, ix = yy // 4, xx // 4

    wl_tab = jnp.asarray([w[0] for w in _UP4_W], jnp.float32)
    lo_off = jnp.asarray([-1, -1, 0, 0], jnp.int32)
    # vertical taps
    y_l = jnp.clip(iy + lo_off[ry], 0, h4 - 1)
    y_r = jnp.clip(iy + lo_off[ry] + 1, 0, h4 - 1)
    wy_l = wl_tab[ry]  # edge collapse (y_l == y_r) handled by the copy branch
    x_l = jnp.clip(ix + lo_off[rx], 0, w4 - 1)
    x_r = jnp.clip(ix + lo_off[rx] + 1, 0, w4 - 1)
    wx_l = wl_tab[rx]

    kk = jnp.broadcast_to(jnp.arange(k)[:, None, None], (*yy.shape, e))
    ee = jnp.broadcast_to(jnp.arange(e)[None, None, :], (*yy.shape, e))

    def g(ys, xs):
        return tags_lo[kk, ee, ys[..., None], xs[..., None]]

    top = g(y_l, x_l)
    bot = g(y_r, x_l)
    left = jnp.where(
        (y_l == y_r)[..., None], top, wy_l[..., None] * top + (1 - wy_l)[..., None] * bot
    )
    top2 = g(y_l, x_r)
    bot2 = g(y_r, x_r)
    right = jnp.where(
        (y_l == y_r)[..., None], top2,
        wy_l[..., None] * top2 + (1 - wy_l)[..., None] * bot2,
    )
    return jnp.where(
        (x_l == x_r)[..., None], left,
        wx_l[..., None] * left + (1 - wx_l)[..., None] * right,
    )


def phase_index(yy, xx, h4: int, w4: int):
    """Flat index into a reshape(..., 16*H4*W4) phase-layout map for integer
    pixel coordinates (y, x) of the full-res map."""
    return ((yy % 4) * 4 + xx % 4) * (h4 * w4) + (yy // 4) * w4 + xx // 4


def phase_gather(phase_map: jnp.ndarray, kk, yy, xx):
    """Gather values at integer (y, x) from a [K, 4, 4, H4, W4] phase-layout
    map. ``kk/yy/xx``: same-shape integer index arrays."""
    k, _, _, h4, w4 = phase_map.shape
    flat = phase_map.reshape(k, 16 * h4 * w4)
    return flat[kk, phase_index(yy, xx, h4, w4)]

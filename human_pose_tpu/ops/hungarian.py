"""Batched Hungarian (linear sum assignment) solver in pure JAX.

Replaces the reference's per-joint CPU Munkres loop
(/root/reference/src/keypoints/grouping.py:55-59,130) — the per-image decode
hotspot — with a fixed-shape, jittable, vmappable O(n^3) shortest augmenting
path implementation (Jonker-Volgenant style with row/column potentials).

The solver works on square float32 cost matrices. Rectangular problems are
handled by padding:
  * extra columns with an equal constant strictly above the max real cost
    (semantically identical to the reference's f64 1e10 padding,
    grouping.py:127-128 — any such constant yields the same optimum set).
    Keep the constant within ~2-4x of the real cost magnitude: float32
    potentials inherit the pad's magnitude once an augmenting path crosses a
    pad column, and e.g. a 1e10 pad (ulp ~1024) erases real cost structure,
    producing suboptimal assignments whenever rows outnumber real columns.
  * extra rows with a constant value per row (constant rows never change the
    optimal assignment of the real rows)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)


def hungarian(cost: jnp.ndarray, num_valid_rows: jnp.ndarray | None = None) -> jnp.ndarray:
    """Solve min-cost matching on a square cost matrix.

    Args:
      cost: [n, n] float32 (finite values; <=1e12 recommended).
      num_valid_rows: optional traced scalar r <= n — only the FIRST r rows are
        assigned (augmenting paths run r times instead of n; the remaining
        rows get -1). Use when trailing rows are padding: skipping them keeps
        the optimum for the real rows and cuts the sequential loop count,
        which dominates decode latency on TPU.

    Returns:
      [n] int32, ``col[r]`` = column assigned to row r (-1 if unassigned).
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)

    # 1-indexed arrays with a virtual column/row 0 (classic formulation).
    u0 = jnp.zeros(n + 1, jnp.float32)
    v0 = jnp.zeros(n + 1, jnp.float32)
    p0 = jnp.zeros(n + 1, jnp.int32)  # p[j] = row matched to column j

    def assign_row(i, uvp):
        u, v, p = uvp
        p = p.at[0].set(i)
        minv = jnp.full(n + 1, _INF, jnp.float32)
        used = jnp.zeros(n + 1, bool)
        way = jnp.zeros(n + 1, jnp.int32)
        j0 = jnp.int32(0)

        def cond(carry):
            u, v, p, minv, used, way, j0 = carry
            return p[j0] != 0

        def body(carry):
            u, v, p, minv, used, way, j0 = carry
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = jnp.concatenate(
                [jnp.array([_INF]), cost[i0 - 1, :] - u[i0] - v[1:]]
            )
            upd = (~used) & (cur < minv)
            way = jnp.where(upd, j0, way)
            minv = jnp.where(upd, cur, minv)
            masked = jnp.where(used, _INF, minv).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, used, way, j1

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, used, way, j0)
        )

        # augmenting path back-substitution
        def cond2(carry):
            j0, p = carry
            return j0 != 0

        def body2(carry):
            j0, p = carry
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = jax.lax.while_loop(cond2, body2, (j0, p))
        return u, v, p

    upper = (n if num_valid_rows is None else jnp.minimum(num_valid_rows, n)) + 1
    _, _, p = jax.lax.fori_loop(1, upper, assign_row, (u0, v0, p0))

    # invert: col j (1..n) -> row p[j]; produce row -> col. Unmatched columns
    # have p[j] == 0 and must not scatter (a -1 row index would wrap).
    rows = jnp.where(p[1:] > 0, p[1:] - 1, n)  # [n]
    col_of_row = jnp.full(n, -1, jnp.int32).at[rows].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    return col_of_row


hungarian_batch = jax.vmap(hungarian)

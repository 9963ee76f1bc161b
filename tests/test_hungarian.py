"""Hungarian solver vs scipy.optimize.linear_sum_assignment."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from human_pose_tpu.ops.hungarian import hungarian, hungarian_batch


@pytest.mark.parametrize("n", [2, 5, 13, 30])
def test_matches_scipy_random(n):
    rng = np.random.RandomState(n)
    for trial in range(5):
        cost = rng.rand(n, n).astype(np.float32) * 100
        col = np.asarray(hungarian(jnp.asarray(cost)))
        r, c = linear_sum_assignment(cost)
        ours = cost[np.arange(n), col].sum()
        ref = cost[r, c].sum()
        assert abs(ours - ref) < 1e-3, (trial, ours, ref)
        # valid permutation
        assert sorted(col.tolist()) == list(range(n))


def test_grouping_like_costs():
    """Costs shaped like the AE grouping problem: round(dist)*100 - score with
    1e10 padding columns and constant fake rows."""
    rng = np.random.RandomState(0)
    n = 30
    for trial in range(5):
        n_real_rows = rng.randint(1, n + 1)
        n_real_cols = rng.randint(1, n + 1)
        dist = np.round(rng.rand(n_real_rows, n_real_cols) * 3) * 100
        score = rng.rand(n_real_rows, 1)
        real = (dist - score).astype(np.float32)
        cost = np.zeros((n, n), np.float32)
        cost[:n_real_rows, :n_real_cols] = real
        cost[:n_real_rows, n_real_cols:] = 1e10
        col = np.asarray(hungarian(jnp.asarray(cost)))
        # restricted to real rows, total must match scipy on the padded
        # rectangular problem
        padded = np.concatenate(
            [real, np.full((n_real_rows, max(0, n_real_rows - n_real_cols)), 1e10, np.float32)],
            axis=1,
        )
        r, c = linear_sum_assignment(padded)
        ref = padded[r, c].sum()
        ours = 0.0
        for rr in range(n_real_rows):
            cc = col[rr]
            ours += real[rr, cc] if cc < n_real_cols else 1e10
        assert abs(ours - ref) < 1.0, (trial, ours, ref)


def test_batched():
    rng = np.random.RandomState(1)
    costs = rng.rand(4, 8, 8).astype(np.float32)
    cols = np.asarray(hungarian_batch(jnp.asarray(costs)))
    for b in range(4):
        r, c = linear_sum_assignment(costs[b])
        assert abs(costs[b][np.arange(8), cols[b]].sum() - costs[b][r, c].sum()) < 1e-4


def test_overflow_rows_homogeneous_pad_optimality():
    """Regression (r3): when candidate rows outnumber real person columns,
    the overflow rows must be CHOSEN optimally. With a 1e10 pad this failed
    in float32 (ulp(1e10) ~ 1024 erases the round(dist)*100 - score
    structure once an augmenting path crosses a pad column, 20/20 random
    cases suboptimal by ~1e2-1e3); grouping.match() now pads just above the
    max real cost, which is exactly equivalent in infinite precision (the
    pad constant cancels across maximal matchings) and f32-safe."""
    rng = np.random.RandomState(7)
    for trial in range(20):
        na, ng, n = 12, 8, 30
        real = (np.round(rng.rand(na, ng) * 8) * 100 - rng.rand(na, ng)).astype(
            np.float32
        )
        pad = np.float32(np.abs(real).max() * 2 + 100)
        cost = np.full((n, n), pad, np.float32)
        cost[:na, :ng] = real
        col = np.asarray(hungarian(jnp.asarray(cost), num_valid_rows=jnp.int32(na)))
        ours = sum(real[r, col[r]] for r in range(na) if 0 <= col[r] < ng)
        r, c = linear_sum_assignment(
            np.concatenate([real, np.full((na, na - ng), 1e10)], 1).astype(np.float64)
        )
        ref = sum(real[rr, cc] for rr, cc in zip(r, c) if cc < ng)
        assert abs(ours - ref) < 1e-3, (trial, ours, ref)

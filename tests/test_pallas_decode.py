"""Pallas refine kernel vs the pure-jnp formulation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from human_pose_tpu.ops.pallas_decode import refine_argmax


def reference_argmax(hm, tags, prev):
    k, hw = hm.shape
    p, e = prev.shape
    idx = np.zeros((k, p), np.int32)
    val = np.zeros((k, p), np.float32)
    for kk in range(k):
        for pp in range(p):
            d = np.sqrt(((tags[kk] - prev[pp][:, None]) ** 2).sum(0))
            diff = hm[kk] - np.round(d)
            idx[kk, pp] = diff.argmax()
            val[kk, pp] = hm[kk, idx[kk, pp]]
    return idx, val


def test_refine_argmax_matches_reference():
    rng = np.random.RandomState(0)
    k, hw, e, p = 4, 4096, 2, 6
    hm = rng.rand(k, hw).astype(np.float32)
    tags = rng.randn(k, e, hw).astype(np.float32)
    prev = rng.randn(p, e).astype(np.float32)
    idx, val = refine_argmax(
        jnp.asarray(hm), jnp.asarray(tags), jnp.asarray(prev), interpret=True
    )
    ridx, rval = reference_argmax(hm, tags, prev)
    np.testing.assert_array_equal(np.asarray(idx), ridx)
    np.testing.assert_allclose(np.asarray(val), rval, atol=1e-6)


def test_refine_argmax_tie_break_first():
    # constant heatmap + zero tags: every position ties -> argmax must return 0
    k, hw, e, p = 2, 256, 1, 3
    hm = np.ones((k, hw), np.float32)
    tags = np.zeros((k, e, hw), np.float32)
    prev = np.zeros((p, e), np.float32)
    idx, val = refine_argmax(
        jnp.asarray(hm), jnp.asarray(tags), jnp.asarray(prev), interpret=True
    )
    assert np.asarray(idx).max() == 0

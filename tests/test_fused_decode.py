"""Fused Pallas decode front-end (ops/pallas_aggregate.py) vs the dense XLA
path — interpret mode on CPU (on-chip parity is re-verified by
scripts/check_fused_tpu.py before benching; CLAUDE.md Pallas rules).

The fused path recomputes the reference decode semantics
(/root/reference/src/keypoints/results.py:225-234 resize+average,
grouping.py:74-83 NMS, :147-170 top-k, :193-250 refine) in phase layout with
dyadic two-tap lerps. Values may differ from the XLA path by ~1 ulp (XLA's
jax.image.resize contracts both spatial dims in ONE einsum whose association
the compiler picks freely — it is not even self-consistent across sizes), so
these tests pin bit-level closeness AND decision-level equality (NMS
survivor set, top-k ids, grouped joints, refine argmax) on fixed seeds.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_tpu.ops.decode import decode_batch, decode_batch_fused
from human_pose_tpu.ops.grouping import nms
from human_pose_tpu.ops.heatmaps import average_stages, resize_bilinear
from human_pose_tpu.ops.pallas_aggregate import (
    fused_aggregate,
    refine_argmax_phase_batch,
    sample_tags_bilinear,
)

B, K, E, H4, W4 = 2, 3, 2, 16, 128
H, W = 4 * H4, 4 * W4


def _phase_to_dense(ph):
    b, k, _, _, h4, w4 = ph.shape
    return jnp.transpose(ph, (0, 1, 4, 2, 5, 3)).reshape(b, k, 4 * h4, 4 * w4)


@pytest.fixture(scope="module")
def maps():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.rand(B, K, H4, W4).astype(np.float32))
    h2 = jnp.asarray(rs.rand(B, K, 2 * H4, 2 * W4).astype(np.float32))
    tags_lo = jnp.asarray(rs.rand(B, K, E, H4, W4).astype(np.float32) * 4)
    return q, h2, tags_lo


def test_fused_aggregate_matches_xla(maps):
    q, h2, _ = maps
    avg_ref = resize_bilinear(
        average_stages([q, h2], channel_major=True), H, W, channel_major=True
    )
    sup_ref = jax.vmap(nms)(avg_ref)
    avg_p, sup_p, cmax = fused_aggregate(q, h2, interpret=True)

    avg_d, sup_d = _phase_to_dense(avg_p), _phase_to_dense(sup_p)
    np.testing.assert_allclose(avg_d, avg_ref, atol=3e-7, rtol=0)
    # identical NMS survivor SET (no exact plateaus in a continuous fixture)
    np.testing.assert_array_equal(np.asarray(sup_d > 0), np.asarray(sup_ref > 0))
    np.testing.assert_allclose(sup_d, sup_ref, atol=3e-7, rtol=0)
    cm = jnp.transpose(cmax, (0, 1, 3, 2)).reshape(B, K, H)
    np.testing.assert_allclose(cm, sup_d.max(axis=3), atol=0, rtol=0)


def test_sample_tags_matches_resize(maps):
    _, _, tags_lo = maps
    dense = jax.image.resize(tags_lo, (B, K, E, H, W), method="linear")
    rs = np.random.RandomState(3)
    ys = jnp.asarray(rs.randint(0, H, (K, 50)))
    xs = jnp.asarray(rs.randint(0, W, (K, 50)))
    got = sample_tags_bilinear(tags_lo[0], ys, xs, H, W)
    want = jnp.stack(
        [dense[0, jnp.arange(K)[:, None], e, ys, xs] for e in range(E)], axis=-1
    )
    # ~2 ulp at tag scale (resize's one-einsum association differs)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_refine_phase_kernel_matches_xla_argmax(maps):
    q, h2, tags_lo = maps
    rs = np.random.RandomState(5)
    P = 6
    prev = jnp.asarray(rs.rand(B, P, E).astype(np.float32) * 4)
    avg_p, _, _ = fused_aggregate(q, h2, interpret=True)
    hm_dense = _phase_to_dense(avg_p)
    tags_dense = jax.image.resize(tags_lo, (B, K, E, H, W), method="linear")

    idx, val = refine_argmax_phase_batch(avg_p, tags_lo, prev, interpret=True)

    tags_flat = jnp.transpose(tags_dense, (0, 1, 3, 4, 2)).reshape(B, K, H * W, E)
    hm_flat = hm_dense.reshape(B, K, H * W)

    def per_person(tf, hf, pv):
        d = jnp.sqrt(jnp.sum((tf - pv[None, None, :]) ** 2, axis=-1))
        return jnp.argmax(hf - jnp.round(d), axis=1)

    ref_idx = jax.vmap(
        lambda tf, hf, prevs: jax.vmap(lambda pv: per_person(tf, hf, pv))(prevs)
    )(tags_flat, hm_flat, prev)  # [B, P, K]
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(jnp.transpose(ref_idx, (0, 2, 1))))
    got_val = np.asarray(val)
    want_val = np.take_along_axis(
        np.asarray(hm_flat), np.asarray(jnp.transpose(ref_idx, (0, 2, 1))), axis=2
    )
    np.testing.assert_allclose(got_val, want_val, atol=3e-7, rtol=0)


def test_fused_decode_matches_dense_decisions(maps):
    """End-to-end: the fused front-end and the dense XLA decode must produce
    the same persons — same grouped coordinates (exact: quarter offsets are
    dyadic), same validity, scores to fp tolerance."""
    rs = np.random.RandomState(7)
    q_n = jnp.asarray(rs.rand(B, H4, W4, K).astype(np.float32))
    h_n = jnp.asarray(rs.rand(B, 2 * H4, 2 * W4, K).astype(np.float32))
    t_n = [jnp.asarray(rs.rand(B, H4, W4, K).astype(np.float32) * 4)
           for _ in range(E)]

    dense = decode_batch(
        [q_n, h_n], t_n, input_hw=(H, W), max_num_people=8,
        det_thr=0.3, tag_thr=1.0,
    )
    fused = decode_batch_fused(
        [q_n, h_n], t_n, input_hw=(H, W), max_num_people=8,
        det_thr=0.3, tag_thr=1.0, do_adjust=True, do_refine=True,
        interpret=True,
    )
    for name, a, b_, exact in (
        ("valid", dense[2], fused[2], True),
        ("scores", dense[1], fused[1], False),
        ("joints_xy", dense[0][..., :2], fused[0][..., :2], True),
        ("joints_rest", dense[0][..., 2:], fused[0][..., 2:], False),
    ):
        if exact:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_), err_msg=name)
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-7, rtol=0, err_msg=name
            )

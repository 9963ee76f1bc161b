"""Pallas grouping kernel vs the XLA lax.scan formulation (interpret mode)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.ops import grouping
from human_pose_tpu.ops.pallas_match import match_by_tag_pallas, match_by_tag_pallas_batched

# The production configuration unrolls the augmenting-path loop; exactness of
# unroll>1 (the body is predicated per image, a no-op after termination) is
# pinned by running the full parity matrix through it as a third "kernel".
match_batched_u4 = functools.partial(match_by_tag_pallas_batched, unroll=4)
KERNELS = [match_by_tag_pallas, match_by_tag_pallas_batched, match_batched_u4]


def synth_candidates(seed, k=17, m=12, e=1, n_persons=4):
    """Candidate tensors like top_k would produce: scores descending, some
    above threshold clustered by person tag."""
    rng = np.random.RandomState(seed)
    tags = rng.randn(k, m, e).astype(np.float32) * 0.05
    coords = rng.randint(0, 100, (k, m, 2)).astype(np.int32)
    scores = np.sort(rng.rand(k, m).astype(np.float32) * 0.04, axis=1)[:, ::-1]
    for p in range(n_persons):
        tag_val = rng.randn(e).astype(np.float32) * 4
        for kk in range(k):
            if rng.rand() < 0.2:
                continue
            slot = p  # top slots = real detections
            scores[kk, slot] = 0.5 + 0.5 * rng.rand()
            tags[kk, slot] = tag_val + rng.randn(e) * 0.02
    # re-sort descending per joint like lax.top_k output
    order = np.argsort(-scores, axis=1, kind="stable")
    scores = np.take_along_axis(scores, order, axis=1)
    tags = np.take_along_axis(tags, order[..., None], axis=1)
    coords = np.take_along_axis(coords, order[..., None], axis=1)
    return tags, coords, scores


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("e", [1, 2])
def test_pallas_match_parity(seed, e, kernel):
    k, m = 17, 12
    tags, coords, scores = synth_candidates(seed, k=k, m=m, e=e)
    det_thr, tag_thr = 0.1, 1.0

    ref_joints, ref_valid = grouping.match_by_tag(
        jnp.asarray(tags), jnp.asarray(coords), jnp.asarray(scores),
        det_thr, tag_thr,
    )
    ref_joints = np.asarray(ref_joints)
    ref_valid = np.asarray(ref_valid)

    f = 3 + e
    cand = np.concatenate(
        [coords.astype(np.float32), scores[..., None], tags], axis=-1
    )  # [K, M, F]
    order = list(grouping.JOINTS_ORDER)
    cand_ordered = cand[order][None]  # [1, K, M, F]
    joints, count = kernel(
        jnp.asarray(cand_ordered), det_thr=det_thr, tag_thr=tag_thr,
        joints_order=tuple(order), num_persons=m, interpret=True,
    )
    joints = np.asarray(joints[0])
    count = int(count[0])

    assert count == int(ref_valid.sum()), (count, int(ref_valid.sum()))
    np.testing.assert_allclose(joints[:count], ref_joints[:count], atol=1e-4)


@pytest.mark.parametrize("kernel", KERNELS)
def test_pallas_match_no_candidates(kernel):
    k, m, e = 17, 8, 1
    cand = np.zeros((1, k, m, 3 + e), np.float32)
    joints, count = kernel(
        jnp.asarray(cand), det_thr=0.1, tag_thr=1.0,
        joints_order=tuple(grouping.JOINTS_ORDER), num_persons=m, interpret=True,
    )
    assert int(count[0]) == 0


@pytest.mark.parametrize("kernel", KERNELS)
def test_pallas_match_batched(kernel):
    k, m, e = 17, 10, 1
    scenes = [synth_candidates(s, k=k, m=m, e=e, n_persons=2 + s) for s in (5, 6)]
    cands = []
    for tags, coords, scores in scenes:
        cand = np.concatenate(
            [coords.astype(np.float32), scores[..., None], tags], axis=-1
        )
        cands.append(cand[list(grouping.JOINTS_ORDER)])
    batch = jnp.asarray(np.stack(cands))
    joints, count = kernel(
        batch, det_thr=0.1, tag_thr=1.0,
        joints_order=tuple(grouping.JOINTS_ORDER), num_persons=m, interpret=True,
    )
    for b, (tags, coords, scores) in enumerate(scenes):
        ref_joints, ref_valid = grouping.match_by_tag(
            jnp.asarray(tags), jnp.asarray(coords), jnp.asarray(scores), 0.1, 1.0
        )
        c = int(count[b])
        assert c == int(np.asarray(ref_valid).sum())
        np.testing.assert_allclose(
            np.asarray(joints[b][:c]), np.asarray(ref_joints)[:c], atol=1e-4
        )


@pytest.mark.parametrize("kernel", KERNELS)
def test_pallas_match_mixed_sparsity_batch(kernel):
    """Pins the dynamic row bound (batch-max last-valid candidate index):
    one batch mixing an empty image, a single-detection image, and an
    all-rows-valid dense image must still match the XLA path per image."""
    k, m, e = 17, 12, 1
    rng = np.random.RandomState(9)

    empty = (
        rng.randn(k, m, e).astype(np.float32) * 0.05,
        rng.randint(0, 100, (k, m, 2)).astype(np.int32),
        np.sort(rng.rand(k, m).astype(np.float32) * 0.05, axis=1)[:, ::-1],
    )
    single = synth_candidates(7, k=k, m=m, e=e, n_persons=1)
    tags_d, coords_d, scores_d = synth_candidates(8, k=k, m=m, e=e, n_persons=4)
    scores_d = np.sort(
        (0.2 + 0.8 * rng.rand(k, m)).astype(np.float32), axis=1
    )[:, ::-1]  # every row above det_thr -> worst-case bound == m
    dense = (tags_d, coords_d, scores_d)

    scenes = [empty, single, dense]
    cands = [
        np.concatenate(
            [c.astype(np.float32), s[..., None], t], axis=-1
        )[list(grouping.JOINTS_ORDER)]
        for t, c, s in scenes
    ]
    joints, count = kernel(
        jnp.asarray(np.stack(cands)), det_thr=0.1, tag_thr=1.0,
        joints_order=tuple(grouping.JOINTS_ORDER), num_persons=m, interpret=True,
    )
    for b, (tags, coords, scores) in enumerate(scenes):
        ref_joints, ref_valid = grouping.match_by_tag(
            jnp.asarray(tags), jnp.asarray(coords), jnp.asarray(scores), 0.1, 1.0
        )
        c = int(count[b])
        assert c == int(np.asarray(ref_valid).sum()), f"image {b}"
        np.testing.assert_allclose(
            np.asarray(joints[b][:c]), np.asarray(ref_joints)[:c], atol=1e-4,
            err_msg=f"image {b}",
        )
    assert int(count[0]) == 0 and int(count[2]) >= 4

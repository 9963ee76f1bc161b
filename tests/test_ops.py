"""Flip merge, bilinear resize parity vs torch, and batched decode."""

import jax.numpy as jnp
import numpy as np
import torch

from human_pose_tpu.ops import (
    COCO_FLIP_INDEX,
    average_stages,
    decode_batch,
    flip_back,
    merge_flip_heatmaps,
    resize_bilinear,
    stack_flip_tags,
)


def test_resize_bilinear_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 24, 5).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), 33, 48))
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(33, 48),
            mode="bilinear", align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_flip_back_involution():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 8, 17).astype(np.float32))
    xf = flip_back(x)
    # flip_back is its own inverse (flip index is an involution)
    np.testing.assert_allclose(np.asarray(flip_back(xf)), np.asarray(x), atol=0)


def test_merge_flip_heatmaps_identity_on_symmetric():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 8, 8, 17).astype(np.float32)
    # construct a flipped version the way the model would see it
    idx = np.asarray(COCO_FLIP_INDEX)
    x_flipped_pred = x[:, :, ::-1, :][..., idx]
    merged = np.asarray(merge_flip_heatmaps(jnp.asarray(x), jnp.asarray(x_flipped_pred)))
    np.testing.assert_allclose(merged, x, atol=1e-6)


def test_stack_flip_tags_shape():
    x = jnp.zeros((2, 8, 8, 17))
    out = stack_flip_tags(x, x)
    assert out.shape == (2, 8, 8, 17, 2)


def test_average_stages_sizes():
    a = jnp.ones((1, 8, 8, 3))
    b = jnp.ones((1, 16, 16, 3)) * 3
    avg = average_stages([a, b])
    assert avg.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(avg), 2.0)


def test_decode_batch_shapes():
    rng = np.random.RandomState(3)
    n, k = 2, 17
    hm14 = jnp.asarray(rng.rand(n, 16, 16, k).astype(np.float32))
    hm12 = jnp.asarray(rng.rand(n, 32, 32, k).astype(np.float32))
    tags = jnp.asarray(rng.rand(n, 16, 16, k).astype(np.float32))
    joints, scores, valid = decode_batch(
        [hm14, hm12], [tags], input_hw=(64, 64), max_num_people=10
    )
    assert joints.shape == (n, 10, k, 3 + 1)
    assert scores.shape == (n, 10)
    assert valid.shape == (n, 10)
    # with flip TTA (two tag maps) the embedding dim becomes 2
    joints2, _, _ = decode_batch(
        [hm14, hm12], [tags, tags], input_hw=(64, 64), max_num_people=10
    )
    assert joints2.shape == (n, 10, k, 3 + 2)


def test_sppe_parse_oracle():
    """sppe_parse vs a NumPy oracle of the reference SPPEHeatmapParser
    (reference grouping.py:10-52): per-keypoint row-major argmax -> (x, y),
    score = heatmap value, one person, first-max tie-break."""
    import jax.numpy as jnp

    from human_pose_tpu.ops import sppe_parse

    rs = np.random.RandomState(0)
    hms = rs.rand(2, 13, 9, 4).astype(np.float32)
    # exact ties pin the first-(row-major)-max tie-break
    hms[0, 3, 2, 0] = 2.0
    hms[0, 7, 5, 0] = 2.0
    out = np.asarray(sppe_parse(jnp.asarray(hms)))
    assert out.shape == (2, 1, 4, 3)
    for n in range(2):
        for k in range(4):
            flat = hms[n, :, :, k].reshape(-1)
            idx = int(np.argmax(flat))  # first max, like torch.argmax on CPU
            assert out[n, 0, k, 0] == idx % 9
            assert out[n, 0, k, 1] == idx // 9
            assert out[n, 0, k, 2] == flat[idx]
    assert (out[0, 0, 0, :2] == (2, 3)).all()  # the tie resolved row-major-first


def test_channel_major_resize_bitexact():
    """The decode path relayouts NHWC->NKHW at the SOURCE resolution and
    resizes channel-major (ops/decode.py) — per-channel bilinear resize
    commutes with the transpose bit-exactly (same taps/weights/accumulation
    per output element), so the layout optimization cannot shift decode."""
    import numpy as np

    from human_pose_tpu.ops.heatmaps import average_stages, resize_bilinear

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.rand(2, 16, 16, 17).astype(np.float32))
    h2 = jnp.asarray(rs.rand(2, 32, 32, 17).astype(np.float32))
    t = jnp.asarray(rs.rand(2, 16, 16, 17).astype(np.float32))

    avg_old = resize_bilinear(average_stages([q, h2]), 64, 64)
    kpts_old = jnp.transpose(avg_old, (0, 3, 1, 2))
    tags_old = jnp.transpose(jnp.stack([resize_bilinear(t, 64, 64)], -1), (0, 3, 1, 2, 4))

    qk, hk = (jnp.transpose(x, (0, 3, 1, 2)) for x in (q, h2))
    kpts_new = resize_bilinear(
        average_stages([qk, hk], channel_major=True), 64, 64, channel_major=True
    )
    tags_new = jnp.stack(
        [resize_bilinear(jnp.transpose(t, (0, 3, 1, 2)), 64, 64, channel_major=True)],
        axis=-1,
    )
    np.testing.assert_array_equal(np.asarray(kpts_old), np.asarray(kpts_new))
    np.testing.assert_array_equal(np.asarray(tags_old), np.asarray(tags_new))

"""Loss parity vs straightforward NumPy implementations of the reference
formulas (/root/reference/src/keypoints/loss.py, src/classification/loss.py)."""

import jax.numpy as jnp
import numpy as np

from human_pose_tpu.train.losses import (
    ae_grouping_loss,
    ae_keypoints_loss,
    classification_loss,
    heatmaps_loss,
)


def np_heatmaps_loss(pred, target, mask):
    return float((((pred - target) ** 2) * mask[..., None]).mean())


def np_ae_loss(pred_tags, joints_list):
    """joints_list: per-sample list of [num_obj, K, 3] int arrays."""
    n = len(joints_list)
    push_total, pull_total = 0.0, 0.0
    for i, objs in enumerate(joints_list):
        refs = []
        pull = 0.0
        for obj in objs:
            tag_vals = []
            for kk, (x, y, vis) in enumerate(obj):
                if vis > 0:
                    tag_vals.append(pred_tags[i, y, x, kk])
            if not tag_vals:
                continue
            tag_vals = np.array(tag_vals)
            ref = tag_vals.mean()
            refs.append(ref)
            pull += ((tag_vals - ref) ** 2).mean()
        num_obj = len(refs)
        if num_obj == 0:
            continue
        pull_total += pull / num_obj
        if num_obj == 1:
            continue
        refs = np.array(refs)
        diff = refs[:, None] - refs[None, :]
        push = np.exp(-(diff**2)).sum() - num_obj
        push_total += push / ((num_obj - 1) * num_obj) * 0.5
    return push_total / n, pull_total / n


def pad_joints(joints_list, p, k):
    out = np.zeros((len(joints_list), p, k, 3), np.int32)
    for i, objs in enumerate(joints_list):
        for j, obj in enumerate(objs[:p]):
            out[i, j] = obj
    return out


def test_heatmaps_loss_parity():
    rng = np.random.RandomState(0)
    pred = rng.rand(2, 8, 8, 3).astype(np.float32)
    target = rng.rand(2, 8, 8, 3).astype(np.float32)
    mask = (rng.rand(2, 8, 8) > 0.3).astype(np.float32)
    ours = float(heatmaps_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))
    assert abs(ours - np_heatmaps_loss(pred, target, mask)) < 1e-6


def test_ae_loss_parity():
    rng = np.random.RandomState(1)
    n, k, h, w = 3, 4, 16, 16
    pred_tags = rng.randn(n, h, w, k).astype(np.float32)
    joints_list = []
    for i in range(n):
        objs = []
        for _ in range(rng.randint(0, 4)):
            obj = np.stack(
                [
                    rng.randint(0, w, k),
                    rng.randint(0, h, k),
                    (rng.rand(k) > 0.4).astype(np.int64),
                ],
                axis=-1,
            )
            objs.append(obj)
        joints_list.append(objs)
    ref_push, ref_pull = np_ae_loss(pred_tags, joints_list)
    padded = pad_joints(joints_list, p=6, k=k)
    push, pull = ae_grouping_loss(jnp.asarray(pred_tags), jnp.asarray(padded))
    assert abs(float(push) - ref_push) < 1e-5
    assert abs(float(pull) - ref_pull) < 1e-5


def test_ae_keypoints_loss_total():
    rng = np.random.RandomState(2)
    n, k = 2, 3
    hms14 = rng.rand(n, 8, 8, k).astype(np.float32)
    hms12 = rng.rand(n, 16, 16, k).astype(np.float32)
    tgt14 = rng.rand(n, 8, 8, k).astype(np.float32)
    tgt12 = rng.rand(n, 16, 16, k).astype(np.float32)
    m14 = np.ones((n, 8, 8), np.float32)
    m12 = np.ones((n, 16, 16), np.float32)
    tags = rng.randn(n, 8, 8, k).astype(np.float32)
    joints = np.zeros((n, 4, k, 3), np.int32)
    joints[0, 0] = [[1, 1, 1], [2, 2, 1], [3, 3, 0]]
    total, metrics = ae_keypoints_loss(
        [jnp.asarray(hms14), jnp.asarray(hms12)],
        jnp.asarray(tags),
        [jnp.asarray(tgt14), jnp.asarray(tgt12)],
        [jnp.asarray(m14), jnp.asarray(m12)],
        jnp.asarray(joints),
    )
    expect = (
        np_heatmaps_loss(hms14, tgt14, m14)
        + np_heatmaps_loss(hms12, tgt12, m12)
        + 1e-3 * sum(np_ae_loss(tags, [[joints[0, 0]], []]))
    )
    assert abs(float(total) - expect) < 1e-5
    assert set(metrics) == {"hm_0", "hm_1", "push", "pull", "loss"}


def test_classification_loss_matches_manual():
    rng = np.random.RandomState(3)
    logits = rng.randn(4, 10).astype(np.float32)
    labels = rng.randint(0, 10, 4)
    ours = float(classification_loss(jnp.asarray(logits), jnp.asarray(labels)))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = -np.log(p[np.arange(4), labels]).mean()
    assert abs(ours - ref) < 1e-5

"""Training losses (TPU-native, fixed shapes, NHWC).

Counterparts of the reference losses:

* ``heatmaps_loss`` — crowd-masked MSE over keypoint heatmaps
  (/root/reference/src/keypoints/loss.py:6-15): squared error times the
  broadcast crowd mask, mean over all elements.
* ``ae_grouping_loss`` — associative-embedding push/pull
  (/root/reference/src/keypoints/loss.py:18-61): per person, pull is the
  variance of its joints' tags around their mean; push is
  ``exp(-(ref_i - ref_j)^2)`` over person pairs, normalized. Tags are sampled
  at integer joint coordinates in the 1/4-resolution tag map
  (loss.py:29-31). The reference's ragged per-sample person lists become a
  fixed-shape ``[N, P, K, 3]`` int array (x, y, vis) padded with vis=0.
* ``classification_loss`` — cross entropy
  (/root/reference/src/classification/loss.py).

Stage weighting follows loss.py:70-93 / module.py:53-57: total =
sum(per-stage heatmap losses) + 1e-3 * (push + pull) at the 1/4 stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TAG_LOSS_WEIGHT = 1e-3  # reference loss.py:91-92


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross entropy with integer labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return nll.mean()


def heatmaps_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked MSE. pred/target [N, H, W, K] float, mask [N, H, W] float."""
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return (err * mask[..., None]).mean()


def _sample_ae(pred_tags, joints):
    """Push/pull for one sample.

    pred_tags: [H, W, K] float32 tag map (1/4 res)
    joints:    [P, K, 3] int32 (x, y, vis) padded with vis=0
    Returns (push, pull) scalars.
    """
    p, k, _ = joints.shape
    x = joints[..., 0]
    y = joints[..., 1]
    vis = joints[..., 2] > 0  # [P, K]

    h, w = pred_tags.shape[:2]
    xc = jnp.clip(x, 0, w - 1)
    yc = jnp.clip(y, 0, h - 1)
    kk = jnp.broadcast_to(jnp.arange(k)[None, :], (p, k))
    tags = pred_tags[yc, xc, kk]  # [P, K]
    tags = jnp.where(vis, tags, 0.0)

    n_vis = vis.sum(axis=1).astype(jnp.float32)  # [P]
    person_valid = n_vis > 0
    safe_n = jnp.maximum(n_vis, 1.0)
    ref_tag = tags.sum(axis=1) / safe_n  # [P] mean tag per person

    # pull: per-person mean squared deviation over its visible joints
    dev = jnp.where(vis, (tags - ref_tag[:, None]) ** 2, 0.0)
    pull_per = dev.sum(axis=1) / safe_n
    num_obj = person_valid.sum().astype(jnp.float32)
    pull = jnp.where(num_obj > 0, jnp.where(person_valid, pull_per, 0.0).sum() / jnp.maximum(num_obj, 1.0), 0.0)

    # push: sum over valid person pairs of exp(-(ref_i - ref_j)^2), minus the
    # diagonal, normalized by (num_obj-1)*num_obj, halved
    dd = (ref_tag[:, None] - ref_tag[None, :]) ** 2
    pair_valid = person_valid[:, None] & person_valid[None, :]
    push_sum = jnp.where(pair_valid, jnp.exp(-dd), 0.0).sum() - num_obj
    denom = jnp.maximum((num_obj - 1.0) * num_obj, 1.0)
    push = jnp.where(num_obj > 1, push_sum / denom * 0.5, 0.0)
    return push, pull


def ae_grouping_loss(pred_tags: jnp.ndarray, joints: jnp.ndarray):
    """Batched push/pull.

    pred_tags: [N, H, W, K] float32 (1/4-res tag maps)
    joints:    [N, P, K, 3] int32 padded
    Returns (push, pull) scalars averaged over the batch (reference
    loss.py:61 divides by batch size including empty samples).
    """
    push, pull = jax.vmap(_sample_ae)(pred_tags.astype(jnp.float32), joints)
    n = pred_tags.shape[0]
    return push.sum() / n, pull.sum() / n


def ae_keypoints_loss(
    stages_pred_heatmaps: list,
    pred_tags: jnp.ndarray,
    stages_target_heatmaps: list,
    masks: list,
    joints_quarter: jnp.ndarray,
):
    """Full pose loss (reference loss.py:70-93 + module.py:53-57).

    Returns (total, metrics_dict).
    """
    hm_losses = [
        heatmaps_loss(p, t, m)
        for p, t, m in zip(stages_pred_heatmaps, stages_target_heatmaps, masks)
    ]
    push, pull = ae_grouping_loss(pred_tags, joints_quarter)
    push = push * TAG_LOSS_WEIGHT
    pull = pull * TAG_LOSS_WEIGHT
    total = sum(hm_losses) + push + pull
    metrics = {f"hm_{i}": l for i, l in enumerate(hm_losses)}
    metrics.update({"push": push, "pull": pull, "loss": total})
    return total, metrics

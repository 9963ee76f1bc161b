"""End-to-end learning signal: overfit a tiny HigherHRNet on one synthetic
sample until the decoded keypoints approximate the ground truth. Exercises the
full loop: target generation -> bf16-free CPU training (heatmap MSE + AE
push/pull) -> device decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.data.targets import HeatmapGenerator, JointsGenerator
from human_pose_tpu.models import HigherHRNet
from human_pose_tpu.ops import decode_batch
from human_pose_tpu.train import TrainState, create_optimizer
from human_pose_tpu.train.steps import keypoints_train_step


@pytest.mark.slow
def test_overfit_single_image_decodes_gt():
    size, k, p = 64, 17, 4
    rng = np.random.RandomState(0)

    # one person, joints well separated at 1/4 resolution
    q = size // 4
    joints_q = np.zeros((1, k, 3), np.int32)
    coords = []
    for i in range(k):
        coords.append((2 + (i * 3) % (q - 4), 2 + (i * 7) % (q - 4)))
    for i, (x, y) in enumerate(coords):
        joints_q[0, i] = (x, y, 2)
    joints_h = joints_q.copy().astype(np.float64)
    joints_h[..., :2] *= 2  # 1/2-res scale

    gen_q = HeatmapGenerator(k, q, sigma=1.0)
    gen_h = HeatmapGenerator(k, size // 2, sigma=1.0)
    jq = JointsGenerator(q, p)(joints_q.astype(np.float64))
    hm_q = gen_q(jq[jq.sum(axis=(1, 2)) > 0])
    jh = JointsGenerator(size // 2, p)(joints_h)
    hm_h = gen_h(jh[jh.sum(axis=(1, 2)) > 0])

    image = rng.rand(1, size, size, 3).astype(np.float32)
    batch = {
        "images": jnp.asarray(image),
        "heatmaps": [jnp.asarray(hm_q[None]), jnp.asarray(hm_h[None])],
        "masks": [
            jnp.ones((1, q, q), jnp.float32),
            jnp.ones((1, size // 2, size // 2), jnp.float32),
        ],
        "joints": jnp.asarray(jq[None]),
    }

    model = HigherHRNet(
        num_kpts=k, C=8, num_blocks_per_stage=(1, 1, 1, 1), num_units=1,
        num_deconv_resid_blocks=1,
    )
    variables = model.init(jax.random.PRNGKey(0), batch["images"], train=False)
    tx = create_optimizer("Adam", lr=3e-3)
    state = TrainState.create(model.apply, variables["params"], variables["batch_stats"], tx)

    first = None
    for step in range(300):
        state, metrics = keypoints_train_step(state, batch, 3e-3)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.2, (first, last)

    # decode the (train-mode-fitted) prediction and compare to GT joints
    out = state.apply_fn(state.variables(), batch["images"], train=False)
    stages_hms, tags = out
    joints_dec, scores, valid = decode_batch(
        [jnp.asarray(h, jnp.float32) for h in stages_hms],
        [jnp.asarray(tags, jnp.float32)],
        input_hw=(size, size), max_num_people=p, det_thr=0.1, tag_thr=1.0,
    )
    v = np.asarray(valid[0])
    assert v.sum() >= 1
    dec = np.asarray(joints_dec[0])[v][0]  # first person, [K, 3+E]
    gt_xy = joints_q[0, :, :2].astype(np.float64) * 4  # to input scale
    det = dec[:, 2] > 0.1
    assert det.sum() >= k // 2, f"only {det.sum()} joints detected"
    err = np.abs(dec[det, :2] - gt_xy[det]).mean()
    assert err < 7.0, f"mean joint error {err:.2f}px at input scale"

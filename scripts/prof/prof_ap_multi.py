"""Calibration study for the multi-person AP-parity fixture (round 4).

Trains the full-depth C=8 HigherHRNet on the 2-persons-per-image learnable
fixture (tests/test_ap_parity.py) and probes, at step checkpoints, whether
(a) the heatmap peaks localize, (b) the AE tag head separates the two
backdrop-tint clusters by more than tag_thr, and (c) the framework pipeline
with flip TTA groups >=2 persons per image and what AP it scores. Output
informs the step count pinned in the test.

CPU-only (the test runs on CPU; also keeps the TPU free for benches).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax.numpy as jnp

from tests.ap_fixture import (
    IN_SIZE,
    K,
    P_CAP,
    make_learnable_fixture as _make_learnable_fixture,
    train_batch_and_views as _train_batch_and_views,
)
from tests.test_data import make_coco_fixture

import human_pose_tpu.train.losses as losses_mod

# the reference 1e-3 tag weight converges over hundreds of epochs of real
# training; the 2-image overfit fixture needs the tag head to separate
# within ~1-2k steps, so the test raises the weight (decode parity — the
# thing under test — is independent of the training loss weighting)
losses_mod.TAG_LOSS_WEIGHT = 0.01

from human_pose_tpu.inference.models import InferenceKeypointsModel
from human_pose_tpu.metrics.cocoeval import COCOKeypointsEval
from human_pose_tpu.models import HigherHRNet
from human_pose_tpu.train import TrainState, create_optimizer
from human_pose_tpu.train.steps import keypoints_train_step


def main(tmp: Path) -> None:
    root = tmp / "coco"
    gt = make_coco_fixture(root, n_images=2, size=96)
    gt = _make_learnable_fixture(root, gt, size=96)
    raws, batch = _train_batch_and_views(root, gt)

    model = HigherHRNet(num_kpts=K, C=8)
    variables = model.init(jax.random.PRNGKey(0), batch["images"], train=False)
    tx = create_optimizer("Adam", lr=2e-3)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )

    def probe(state, step, t0):
        trained = {"params": state.params, "batch_stats": state.batch_stats}
        # diagnostics: heatmap strength + tag stats AT GT joints (eval view)
        out = model.apply(trained, batch["images"], train=False)
        (hq, hh), tags = out
        import numpy as np
        jq = np.asarray(batch["joints"])  # [N, P, K, 3] quarter-res ints
        diag = []
        for i in range(jq.shape[0]):
            hmq = np.asarray(hq[i])
            tg = np.asarray(tags[i])
            for pers in range(jq.shape[1]):
                pts = jq[i, pers]
                if pts[:, 2].sum() == 0:
                    continue
                ys = np.clip(pts[:, 1], 0, hmq.shape[0] - 1)
                xs = np.clip(pts[:, 0], 0, hmq.shape[1] - 1)
                hv = hmq[ys, xs, np.arange(jq.shape[2])]
                tv = tg[ys, xs, np.arange(jq.shape[2])]
                diag.append({"img": i, "p": pers,
                             "hm@gt": round(float(hv.mean()), 3),
                             "tag_mean": round(float(tv.mean()), 3),
                             "tag_std": round(float(tv.std()), 3)})
        print(json.dumps({"step": step, "diag": diag}), flush=True)
        for use_flip, det_thr in ((True, 0.25), (False, 0.25)):
            mine = InferenceKeypointsModel(
                model, trained, det_thr=det_thr, tag_thr=0.4, input_size=IN_SIZE,
                max_num_people=P_CAP, use_flip=use_flip,
            )
            dets, counts = [], []
            for i, raw in enumerate(raws):
                d = mine(raw).to_coco_detections(image_id=i)
                counts.append(len(d))
                dets += d
            ap = COCOKeypointsEval(gt, dets).evaluate()[0]
            print(json.dumps({
                "step": step, "min": round(float(time.time() - t0) / 60, 1),
                "flip": use_flip, "persons_per_image": counts,
                "ap": round(float(ap), 3),
            }), flush=True)

    t0 = time.time()
    # Phase A: heatmap learning (reference-ish tag weight). The AE push loss
    # exp(-(h_i-h_j)^2) has ZERO gradient at identical tags — a saddle the
    # 2-image overfit cannot escape at small weight. Phase B cranks the tag
    # weight with a small lr: heatmaps are converged (small gradients) and
    # the amplified push breaks the symmetry within a few hundred steps.
    step = 0
    def copy_batch():
        return {k: (list(map(jnp.copy, v)) if isinstance(v, list) else jnp.copy(v))
                for k, v in batch.items()}
    for target in (1600,):
        while step < target:
            state, metrics = keypoints_train_step(state, copy_batch(), 2e-3)
            step += 1
        print(json.dumps({"phase": "A", "step": step,
                          "loss": round(float(metrics["loss"]), 4),
                          "push": round(float(metrics["push"]), 5),
                          "pull": round(float(metrics["pull"]), 5)}), flush=True)
        probe(state, step, t0)

    from human_pose_tpu.train.steps import keypoints_train_step_body
    losses_mod.TAG_LOSS_WEIGHT = 2.0
    step_b = jax.jit(lambda st, b: keypoints_train_step_body(st, b, 5e-4))
    for target in (2000, 2400):
        while step < target:
            state, metrics = step_b(state, copy_batch())
            step += 1
        print(json.dumps({"phase": "B", "step": step,
                          "loss": round(float(metrics["loss"]), 4),
                          "push": round(float(metrics["push"]), 5),
                          "pull": round(float(metrics["pull"]), 5)}), flush=True)
        probe(state, step, t0)


if __name__ == "__main__":
    import tempfile

    main(Path(tempfile.mkdtemp()))

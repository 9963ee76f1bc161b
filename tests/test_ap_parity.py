"""COCO-AP-level cross-framework parity on TRAINED weights.

The strongest AP evidence available without real COCO data: overfit a
full-depth C=8 HigherHRNet on the synthetic COCO fixture (sharp, non-degenerate
heatmap peaks — no tie-flip caveats), then drive BOTH complete inference
pipelines — the reference's actual torch InferenceKeypointsModel
(/root/reference/src/keypoints/model.py:42-110, shimmed deps) and this
framework's jitted pipeline — on the SAME weights and images, score each
pipeline's detections with the NumPy COCOeval against the fixture ground
truth, and require (a) a nontrivial AP (training + decode + eval all work
end-to-end) and (b) near-identical AP across frameworks.

Training uses the EVAL view (resize_align to 64) so the memorized mapping is
exactly what inference sees; targets follow the reference's windowed-gaussian
convention (data/targets.py).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "src").exists(), reason="reference checkout not available"
)

if str(Path(__file__).parent.parent) not in sys.path:
    sys.path.insert(0, str(Path(__file__).parent.parent))

K, P_CAP, IN_SIZE = 17, 10, 64


def _make_learnable_fixture(root, gt, size: int = 96):
    """Rewrite the generic fixture into a LEARNABLE detection task: one
    person per image, the 17 keypoints REWRITTEN onto a jittered 5x4 grid
    (so the per-joint color discs never occlude each other) and marked with
    joint-specific color discs — the convnet learns color -> joint, so sharp
    peaks emerge within ~1-2k steps and transfer between the train and eval
    views — plus person-scale OKS area (the fixture's size/3 boxes make OKS
    untenably strict at a 4-px heatmap stride)."""
    import json

    import cv2

    rng = np.random.RandomState(7)
    colors = [
        tuple(int(c) for c in cv2.cvtColor(
            np.uint8([[[int(k * 180 / K), 255, 255]]]), cv2.COLOR_HSV2RGB
        )[0, 0])
        for k in range(K)
    ]
    keep = {}
    for a in gt["annotations"]:
        keep.setdefault(a["image_id"], a)  # first annotation per image
    gt["annotations"] = list(keep.values())
    cell = size // 5
    for a in gt["annotations"]:
        a["area"] = float(size * size)
        a["bbox"] = [0.0, 0.0, float(size), float(size)]
        kp = []
        for k in range(K):
            cx = (k % 5) * cell + cell // 2
            cy = (k // 5) * cell + cell // 2 + 4
            kp += [
                int(cx + rng.randint(-4, 5)),
                int(cy + rng.randint(-4, 5)),
                2,
            ]
        a["keypoints"] = kp
        a["num_keypoints"] = K
    for im in gt["images"]:
        img = (rng.rand(size, size, 3) * 40).astype(np.uint8)  # dim background
        kp = np.asarray(keep[im["id"]]["keypoints"]).reshape(K, 3)
        for k in range(K):
            cv2.circle(img, (int(kp[k, 0]), int(kp[k, 1])), 6, colors[k], -1)
        cv2.imwrite(
            str(root / "images" / "val2017" / im["file_name"]),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
        )
    with open(root / "annotations" / "person_keypoints_val2017.json", "w") as f:
        json.dump(gt, f)
    return gt


def _train_batch_and_views(root, gt):
    """Per-image eval-view inputs + reference-convention targets."""
    import cv2
    import jax.numpy as jnp

    from human_pose_tpu.data.affine import (
        affine_transform_point,
        get_affine_transform,
        resize_align_multi_scale,
    )
    from human_pose_tpu.data.targets import HeatmapGenerator, JointsGenerator
    from human_pose_tpu.data.transforms import normalize

    by_img = {}
    for a in gt["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)

    gen_q = HeatmapGenerator(K, IN_SIZE // 4, sigma=1.5)
    gen_h = HeatmapGenerator(K, IN_SIZE // 2, sigma=1.5)
    jgen_q = JointsGenerator(IN_SIZE // 4, P_CAP)

    raws, xs, hms_q, hms_h, joints_list = [], [], [], [], []
    for im in sorted(gt["images"], key=lambda d: d["id"]):
        raw = cv2.cvtColor(
            cv2.imread(str(root / "images" / "val2017" / im["file_name"])),
            cv2.COLOR_BGR2RGB,
        )
        resized, center, scale = resize_align_multi_scale(raw, IN_SIZE, 1.0, 1.0)
        h, w = resized.shape[:2]
        trans = get_affine_transform(center, scale, 0, (w, h))

        anns = by_img[im["id"]]
        joints_q = np.zeros((len(anns), K, 3), np.float64)
        for p, a in enumerate(anns):
            kp = np.asarray(a["keypoints"], np.float64).reshape(K, 3)
            for k in range(K):
                xy = affine_transform_point(kp[k, :2], trans)
                joints_q[p, k] = (xy[0] / 4.0, xy[1] / 4.0, kp[k, 2])
        joints_h = joints_q.copy()
        joints_h[..., :2] *= 2.0

        jq = jgen_q(joints_q)
        hms_q.append(gen_q(jq[jq.sum(axis=(1, 2)) > 0]))
        jh = JointsGenerator(IN_SIZE // 2, P_CAP)(joints_h)
        hms_h.append(gen_h(jh[jh.sum(axis=(1, 2)) > 0]))
        joints_list.append(jq)
        raws.append(raw)
        xs.append(normalize(resized))

    q = IN_SIZE // 4
    batch = {
        "images": jnp.asarray(np.stack(xs)),
        "heatmaps": [jnp.asarray(np.stack(hms_q)), jnp.asarray(np.stack(hms_h))],
        "masks": [
            jnp.ones((len(xs), q, q), jnp.float32),
            jnp.ones((len(xs), 2 * q, 2 * q), jnp.float32),
        ],
        "joints": jnp.asarray(np.stack(joints_list)),
    }
    return raws, batch


def _detections_from_ref(result, image_id: int) -> list[dict]:
    """Same COCO export the framework result performs (results.py
    to_coco_detections), applied to the reference pipeline's result."""
    coords = np.asarray(result.kpts_coords, np.float64)
    out = []
    for p in range(len(coords)):
        kpts = []
        for k in range(coords.shape[1]):
            kpts += [float(coords[p, k, 0]), float(coords[p, k, 1]), 1]
        out.append(
            {
                "image_id": int(image_id),
                "category_id": 1,
                "keypoints": kpts,
                "score": float(np.asarray(result.obj_scores)[p]),
            }
        )
    return out


@pytest.mark.slow
def test_trained_weights_ap_parity_across_pipelines(tmp_path):
    import jax
    import jax.numpy as jnp

    from tests.reference_shims import install_reference_shims
    from tests.test_data import make_coco_fixture

    from human_pose_tpu.inference.models import (
        InferenceKeypointsModel as MyInferenceModel,
    )
    from human_pose_tpu.metrics.cocoeval import COCOKeypointsEval
    from human_pose_tpu.models import HigherHRNet
    from human_pose_tpu.train import TrainState, create_optimizer
    from human_pose_tpu.train.steps import keypoints_train_step
    from human_pose_tpu.utils.torch_interop import variables_to_torch

    root = tmp_path / "coco"
    gt = make_coco_fixture(root, n_images=2, size=96)
    gt = _make_learnable_fixture(root, gt, size=96)
    raws, batch = _train_batch_and_views(root, gt)

    # full reference depth (the torch net is fixed-depth), narrow channels
    model = HigherHRNet(num_kpts=K, C=8)
    variables = model.init(jax.random.PRNGKey(0), batch["images"], train=False)
    tx = create_optimizer("Adam", lr=3e-3)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    # 1500 steps: measured argmax localization reaches median 1.0 heatmap px
    # and both pipelines score an IDENTICAL AP of 0.8 on this fixture (probed
    # at 1200/1500/2500 steps; 2500 differs only by one near-threshold OKS
    # cell flip, 0.825 vs 0.9 — sub-ulp coordinate differences at an OKS
    # threshold edge, not a pipeline divergence).
    for _ in range(1500):
        state, metrics = keypoints_train_step(
            state, {k: (list(map(jnp.copy, v)) if isinstance(v, list) else jnp.copy(v))
                    for k, v in batch.items()}, 3e-3
        )
    assert float(metrics["loss"]) < 1.0, f"overfit failed: {metrics}"
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    # --- this framework's full pipeline -> AP
    mine = MyInferenceModel(
        model, trained, det_thr=0.1, tag_thr=1.0, input_size=IN_SIZE,
        max_num_people=P_CAP,
    )
    my_dets = []
    for i, raw in enumerate(raws):
        my_dets += mine(raw).to_coco_detections(image_id=i)
    ap_mine = COCOKeypointsEval(gt, my_dets).evaluate()[0]

    # --- the reference's full pipeline on the SAME weights -> AP
    install_reference_shims()
    import src.keypoints.model as km
    from src.keypoints.architectures.higher_hrnet import HigherHRNet as RefNet

    net = RefNet(num_kpts=K, C=8).eval()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in variables_to_torch(jax.device_get(trained)).items()}
    missing, unexpected = net.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing

    ref_model = km.InferenceKeypointsModel(
        net=net, det_thr=0.1, tag_thr=1.0, use_flip=False,
        input_size=IN_SIZE, max_num_people=P_CAP, device="cpu", ckpt_path=None,
    )
    ref_dets = []
    for i, raw in enumerate(raws):
        ref_dets += _detections_from_ref(ref_model(raw, None), i)
    ap_ref = COCOKeypointsEval(gt, ref_dets).evaluate()[0]

    # trained peaks are sharp -> no tie-flip caveat; both pipelines must find
    # the memorized people and score near-identically. Tolerance: one OKS
    # threshold-cell flip on this 2-person fixture is 0.05 AP; allow two
    # (near-threshold OKS values can flip with BLAS summation order).
    assert ap_mine > 0.55, f"our pipeline AP too low: {ap_mine:.3f}"
    assert abs(ap_mine - ap_ref) < 0.11, (
        f"AP diverged: ours {ap_mine:.3f} vs reference pipeline {ap_ref:.3f}"
    )

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
    """Rewrite the generic fixture into a LEARNABLE MULTI-PERSON detection
    task: TWO persons per image (top/bottom bands), each marked with the same
    joint-specific color discs (the convnet learns color -> joint) over a
    person-specific backdrop tint (the AE tag head learns tint -> embedding,
    so grouping must genuinely separate two tag clusters per image).

    The layout and appearance are built for flip TTA (reference semantics:
    /root/reference/src/keypoints/model.py:85-96 — flip the image, flip the
    heatmaps back, permute channels by COCO_FLIP_INDEX, average). TTA is only
    coherent if the MIRRORED appearance of joint k equals the appearance of
    joint flip[k] (that is what the channel permute assumes — a mirrored left
    wrist looks like a right wrist). So flip-pair joints (2p+1, 2p+2) share
    one pair color and differ by a mirror-sensitive glyph (a white dot offset
    left vs right of the disc center); self-paired joint 0 gets a symmetric
    disc. Geometrically, pair joints sit at horizontally mirrored positions
    (same y) and joint 0 on the centerline, so the flipped forward's
    channel-permuted peaks land on the SAME pixels as the direct forward's
    and TTA averaging reinforces rather than smears. Per-pair jitter keeps
    the mirror symmetry exact. OKS area is person-scale (the fixture's size/3
    boxes make OKS untenably strict at a 4-px heatmap stride)."""
    import json

    import cv2

    rng = np.random.RandomState(7)
    # 9 hues: one per flip PAIR (+1 for self-paired joint 0)
    hues = [
        tuple(int(c) for c in cv2.cvtColor(
            np.uint8([[[int(i * 180 / 9), 255, 255]]]), cv2.COLOR_HSV2RGB
        )[0, 0])
        for i in range(9)
    ]

    def joint_color(k: int):
        return hues[0] if k == 0 else hues[1 + (k - 1) // 2]

    def dot_offset(k: int):
        """Mirror-sensitive glyph: odd joints (left element of the pair)
        carry the white dot left of center, even joints right; joint 0 none.
        Sized to survive the 96 -> 64 eval resize (disc r7, dot r3, offset 3
        -> disc r4.7, dot r2, offset 2 at input res)."""
        if k == 0:
            return None
        return -3 if k % 2 == 1 else 3
    tints = [(20, 50, 20), (50, 20, 50)]  # person-specific backdrop (RGB)
    band = size // 2
    annotations = []
    ann_id = 1
    for im in gt["images"]:
        for p in range(2):
            y0 = p * band
            kp = np.zeros((K, 3), np.int64)
            # 3 rows x 3 mirror-column slots per band (r7 discs need >=14 px
            # spacing); joint 0 takes the middle-row centerline slot
            kp[0] = (size // 2 - 1, y0 + 8 + 16, 2)
            for pair in range(8):  # flip pairs (2p+1, 2p+2)
                row, col = divmod(pair, 3)
                dx = (14, 28, 42)[col] + rng.randint(-1, 2)
                y = y0 + 8 + 16 * row + rng.randint(-1, 2)
                kp[2 * pair + 1] = (size // 2 - dx, y, 2)
                kp[2 * pair + 2] = (size - 1 - (size // 2 - dx), y, 2)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": im["id"],
                    "category_id": 1,
                    "keypoints": [int(v) for v in kp.reshape(-1)],
                    "num_keypoints": K,
                    "iscrowd": 0,
                    "area": float(size * size),
                    "bbox": [0.0, float(y0), float(size), float(band)],
                    "segmentation": [
                        [0, y0, size, y0, size, y0 + band, 0, y0 + band]
                    ],
                }
            )
            ann_id += 1
    gt["annotations"] = annotations
    by_img = {}
    for a in annotations:
        by_img.setdefault(a["image_id"], []).append(a)
    for im in gt["images"]:
        img = (rng.rand(size, size, 3) * 25).astype(np.uint8)
        for p, a in enumerate(by_img[im["id"]]):
            img[p * band:(p + 1) * band] += np.uint8(tints[p])
            kp = np.asarray(a["keypoints"]).reshape(K, 3)
            for k in range(K):
                cx, cy = int(kp[k, 0]), int(kp[k, 1])
                cv2.circle(img, (cx, cy), 7, joint_color(k), -1)
                off = dot_offset(k)
                if off is not None:
                    cv2.circle(img, (cx + off, cy), 3, (255, 255, 255), -1)
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
    from human_pose_tpu.utils.torch_interop import variables_to_torch

    import human_pose_tpu.train.losses as losses_mod
    from human_pose_tpu.train.steps import keypoints_train_step_body

    root = tmp_path / "coco"
    gt = make_coco_fixture(root, n_images=2, size=96)
    gt = _make_learnable_fixture(root, gt, size=96)
    raws, batch = _train_batch_and_views(root, gt)

    # full reference depth (the torch net is fixed-depth), narrow channels
    model = HigherHRNet(num_kpts=K, C=8)
    variables = model.init(jax.random.PRNGKey(0), batch["images"], train=False)
    # clip_norm: the 2-image overfit at lr 2e-3 sits near the stability edge
    # (diverged on a contended host with a different oneDNN kernel choice);
    # global-norm clipping removes the spike path without slowing learning
    tx = create_optimizer("Adam", lr=2e-3, clip_norm=1.0)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )

    def copy_batch():
        return {k: (list(map(jnp.copy, v)) if isinstance(v, list) else jnp.copy(v))
                for k, v in batch.items()}

    # Two-phase overfit (calibrated via prof_ap_multi.py): the AE push loss
    # exp(-(h_i - h_j)^2) has ZERO gradient at identical tags — a saddle a
    # 2-image overfit cannot escape at production weights. Phase A learns
    # heatmaps at near-reference tag weight; phase B cranks the tag weight
    # with a small lr to break the symmetry (measured: person tag means
    # separate to |dt| ~ 2.3 with per-person std ~0.02 within 400 steps,
    # flip-TTA AP 0.63). Locally-jitted steps guarantee the staged weight is
    # what each phase traces with (and can't leak into other tests' traces).
    saved_weight = losses_mod.TAG_LOSS_WEIGHT
    try:
        losses_mod.TAG_LOSS_WEIGHT = 0.01
        step_a = jax.jit(lambda st, b: keypoints_train_step_body(st, b, 2e-3))
        for _ in range(1600):
            state, metrics = step_a(state, copy_batch())
        assert float(metrics["loss"]) < 1.0, f"overfit failed: {metrics}"
        losses_mod.TAG_LOSS_WEIGHT = 2.0
        step_b = jax.jit(lambda st, b: keypoints_train_step_body(st, b, 5e-4))
        for _ in range(400):
            state, metrics = step_b(state, copy_batch())
    finally:
        losses_mod.TAG_LOSS_WEIGHT = saved_weight
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    # --- this framework's full pipeline (flip TTA ON) -> AP
    mine = MyInferenceModel(
        model, trained, det_thr=0.25, tag_thr=0.4, input_size=IN_SIZE,
        max_num_people=P_CAP, use_flip=True,
    )
    my_dets = []
    my_persons_per_image = []
    for i, raw in enumerate(raws):
        dets = mine(raw).to_coco_detections(image_id=i)
        my_persons_per_image.append(len(dets))
        my_dets += dets
    ap_mine = COCOKeypointsEval(gt, my_dets).evaluate()[0]

    # the decode must genuinely GROUP multiple tag clusters per image — a
    # single-person (or merged) decode cannot pass this
    assert all(n >= 2 for n in my_persons_per_image), (
        f"grouping did not separate persons: {my_persons_per_image}"
    )

    # --- the reference's full pipeline on the SAME weights (flip TTA) -> AP
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
        net=net, det_thr=0.25, tag_thr=0.4, use_flip=True,
        input_size=IN_SIZE, max_num_people=P_CAP, device="cpu", ckpt_path=None,
    )
    ref_dets = []
    for i, raw in enumerate(raws):
        ref_dets += _detections_from_ref(ref_model(raw, None), i)
    ap_ref = COCOKeypointsEval(gt, ref_dets).evaluate()[0]

    # trained peaks are sharp -> no tie-flip caveat; both pipelines must find
    # the memorized people and score near-identically. Tolerance: one OKS
    # threshold-cell flip on this 4-annotation fixture moves AP by ~0.025;
    # allow a few (near-threshold OKS values can flip with BLAS summation
    # order between torch and XLA).
    assert ap_mine > 0.45, f"our pipeline AP too low: {ap_mine:.3f}"
    assert abs(ap_mine - ap_ref) < 0.11, (
        f"AP diverged: ours {ap_mine:.3f} vs reference pipeline {ap_ref:.3f}"
    )

"""End-to-end decode -> COCO AP consistency: feed ground-truth Gaussian
heatmaps + tag maps through the full device decode and the NumPy COCO
evaluator; near-perfect AP proves the decode/eval stack is self-consistent."""

import numpy as np
import jax.numpy as jnp

from human_pose_tpu.data.targets import HeatmapGenerator
from human_pose_tpu.metrics.cocoeval import COCOKeypointsEval
from human_pose_tpu.ops import decode_batch


def synth_gt_scene(rng, size=128, n_persons=2, k=17, min_dist=14):
    """Random persons with well-separated joints + per-person tags."""
    while True:
        persons = []
        for _ in range(n_persons):
            cx, cy = rng.randint(20, size - 20, 2)
            joints = np.stack(
                [
                    np.clip(cx + rng.randint(-12, 13, k), 2, size - 3),
                    np.clip(cy + rng.randint(-12, 13, k), 2, size - 3),
                    np.full(k, 2),
                ],
                axis=-1,
            )
            persons.append(joints)
        # ensure same-joint detections are separable across persons
        ok = True
        for kk in range(k):
            for i in range(n_persons):
                for j in range(i + 1, n_persons):
                    d = np.hypot(*(persons[i][kk, :2] - persons[j][kk, :2]))
                    if d < min_dist:
                        ok = False
        if ok:
            return persons


def test_gt_heatmaps_decode_to_near_perfect_ap():
    rng = np.random.RandomState(0)
    size, k = 128, 17
    hm_gen = HeatmapGenerator(k, size, sigma=2.0)
    gts, dts, images = [], [], []
    ann_id = 1
    for img_id in range(4):
        persons = synth_gt_scene(rng, size=size)
        joints = np.stack(persons).astype(np.int32)
        hms = hm_gen(joints)  # [H, W, K]
        tags = np.zeros((size, size, k), np.float32)
        for p, person in enumerate(persons):
            tag_val = (p + 1) * 10.0
            for kk, (x, y, _) in enumerate(person):
                tags[max(0, y - 3) : y + 4, max(0, x - 3) : x + 4, kk] = tag_val

        joints_dec, scores, valid = decode_batch(
            [jnp.asarray(hms[None])], [jnp.asarray(tags[None])],
            input_hw=(size, size), max_num_people=10, det_thr=0.1, tag_thr=1.0,
        )
        joints_dec = np.asarray(joints_dec[0])[np.asarray(valid[0])]
        scores = np.asarray(scores[0])[np.asarray(valid[0])]
        assert len(joints_dec) == len(persons), (img_id, len(joints_dec))

        images.append({"id": img_id})
        for person in persons:
            kpts = []
            for x, y, v in person:
                kpts += [float(x), float(y), 2]
            gts.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": 1,
                    "keypoints": kpts,
                    "num_keypoints": k,
                    "iscrowd": 0,
                    "area": 40.0 * 40.0,
                    "bbox": [float(person[:, 0].min()), float(person[:, 1].min()),
                             40.0, 40.0],
                }
            )
            ann_id += 1
        for p in range(len(joints_dec)):
            kpts = []
            for kk in range(k):
                kpts += [float(joints_dec[p, kk, 0]), float(joints_dec[p, kk, 1]), 1]
            dts.append(
                {"image_id": img_id, "category_id": 1, "keypoints": kpts,
                 "score": float(scores[p])}
            )

    ev = COCOKeypointsEval({"annotations": gts, "images": images}, dts)
    stats = ev.evaluate()
    # decode lands within a quarter pixel of GT -> OKS ~ 1.0
    assert stats[0] > 0.99, f"AP={stats[0]}\n{ev.summarize()}"

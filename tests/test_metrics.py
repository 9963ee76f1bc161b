"""OKS + COCO keypoint AP evaluator sanity tests."""

import numpy as np

from human_pose_tpu.metrics import (
    COCOKeypointsEval,
    compute_oks_matrix,
    image_OKS,
    match_preds_to_targets,
    object_OKS,
    pckh,
)


def make_gt(img_id, ann_id, kpts_xy, area=900.0, num_keypoints=None):
    kpts = []
    for x, y in kpts_xy:
        kpts += [float(x), float(y), 2]
    return {
        "id": ann_id,
        "image_id": img_id,
        "category_id": 1,
        "keypoints": kpts,
        "num_keypoints": num_keypoints if num_keypoints is not None else len(kpts_xy),
        "iscrowd": 0,
        "area": area,
        "bbox": [0.0, 0.0, 30.0, 30.0],
    }


def make_dt(img_id, kpts_xy, score=0.9):
    kpts = []
    for x, y in kpts_xy:
        kpts += [float(x), float(y), 1]
    return {"image_id": img_id, "category_id": 1, "keypoints": kpts, "score": score}


def rand_kpts(rng, n=17, size=100):
    return [(rng.randint(0, size), rng.randint(0, size)) for _ in range(n)]


def test_oks_perfect_is_one():
    rng = np.random.RandomState(0)
    kpts = np.array(rand_kpts(rng), np.float64)
    vis = np.ones(17)
    polys = [[0, 0, 50, 0, 50, 50, 0, 50]]
    assert abs(object_OKS(kpts, kpts, vis, polys) - 1.0) < 1e-9
    assert abs(image_OKS(kpts[None], kpts[None], vis[None], [polys]) - 1.0) < 1e-6


def test_oks_matrix_perfect():
    rng = np.random.RandomState(1)
    k = rand_kpts(rng)
    gt = make_gt(0, 1, k)
    dt = make_dt(0, k)
    m = compute_oks_matrix([dt], [gt])
    assert abs(m[0, 0] - 1.0) < 1e-9


def test_ap_perfect_detections():
    rng = np.random.RandomState(2)
    gts, dts, images = [], [], []
    ann_id = 1
    for img_id in range(4):
        images.append({"id": img_id})
        for _ in range(2):
            k = rand_kpts(rng)
            gts.append(make_gt(img_id, ann_id, k, area=2000.0))
            dts.append(make_dt(img_id, k, score=rng.rand() * 0.5 + 0.5))
            ann_id += 1
    ev = COCOKeypointsEval({"annotations": gts, "images": images}, dts)
    stats = ev.evaluate()
    assert abs(stats[0] - 1.0) < 1e-6  # AP
    assert abs(stats[5] - 1.0) < 1e-6  # AR
    summary = ev.summarize()
    assert "Average Precision" in summary and "0.50:0.95" in summary


def test_ap_no_detections_zero():
    rng = np.random.RandomState(3)
    gts = [make_gt(0, 1, rand_kpts(rng), area=2000.0)]
    ev = COCOKeypointsEval({"annotations": gts, "images": [{"id": 0}]}, [])
    stats = ev.evaluate()
    assert stats[0] <= 0.0


def test_ap_half_detections():
    rng = np.random.RandomState(4)
    gts, dts, images = [], [], []
    ann_id = 1
    for img_id in range(8):
        images.append({"id": img_id})
        k = rand_kpts(rng)
        gts.append(make_gt(img_id, ann_id, k, area=2000.0))
        if img_id < 4:
            dts.append(make_dt(img_id, k, score=0.9))
        ann_id += 1
    ev = COCOKeypointsEval({"annotations": gts, "images": images}, dts)
    stats = ev.evaluate()
    # perfect precision at recall 0.5 -> AP ~= 0.5 (101-pt interpolation)
    assert 0.45 < stats[0] < 0.55


def test_match_preds_to_targets():
    t = np.zeros((2, 3, 2))
    t[0] += 10
    t[1] += 50
    vis = np.ones((2, 3))
    preds = np.stack([t[1] + 0.5, t[0] + 0.5])
    idx = match_preds_to_targets(preds, np.array([0.9, 0.8]), t, vis)
    assert idx == [1, 0]


def test_pckh():
    t = np.zeros((1, 16, 2))
    t[0, 9] = (0, 0)
    t[0, 8] = (0, 10)  # head length 10
    p = t.copy()
    p[0, 0] = (3, 0)  # within 0.5*10
    vis = np.ones((1, 16))
    assert pckh(p, t, vis) == 1.0
    p[0, 1] = (20, 0)  # off by 20 > 5
    assert pckh(p, t, vis) < 1.0

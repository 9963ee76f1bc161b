"""Adversarial fixtures for the pure-NumPy COCOKeypointsEval, each pinning one
tricky pycocotools semantic with a hand-computed expected result
(reference eval flow: src/keypoints/bin/eval.py:52-65):

* iscrowd=1 gts are ignore and absorb MULTIPLE detections
* num_keypoints=0 gts are ignore with bbox-distance fallback OKS
* unmatched dts outside the area range are ignored (not FPs)
* maxDets=20 truncation drops low-score detections entirely
* duplicate scores: stable mergesort order = image order (AP depends on it)
"""

import numpy as np

from human_pose_tpu.metrics.cocoeval import COCOKeypointsEval, compute_oks_matrix


def kpts(points, v=2):
    """17 keypoints: cycle the given (x, y) points, visibility v."""
    out = []
    for i in range(17):
        x, y = points[i % len(points)]
        out += [float(x), float(y), v]
    return out


def gt_ann(img_id, ann_id, points, area=3600.0, iscrowd=0, num_keypoints=17,
           v=2, bbox=None):
    return {
        "id": ann_id, "image_id": img_id, "category_id": 1,
        "keypoints": kpts(points, v=v), "num_keypoints": num_keypoints,
        "area": area, "iscrowd": iscrowd,
        "bbox": bbox or [0, 0, 60, 60],
    }


def dt_ann(img_id, points, score):
    return {"image_id": img_id, "category_id": 1,
            "keypoints": kpts(points), "score": score}


def run(gts, dts, img_ids):
    ev = COCOKeypointsEval(
        {"annotations": gts, "images": [{"id": i} for i in img_ids]}, dts
    )
    return ev.evaluate()


def test_list_form_gt_counts_fp_on_gt_empty_image():
    """List-form GT (no 'images' index): a detection on an image with no GT
    annotations must still be evaluated as a false positive — deriving the
    image set from GT alone would silently drop it and inflate AP."""
    P1 = [(20, 20)]
    gts = [gt_ann(1, 1, P1)]
    dts_clean = [dt_ann(1, P1, 0.9)]
    dts_fp = dts_clean + [dt_ann(2, [(50, 50)], 0.95)]  # image 2 has no GT

    clean = COCOKeypointsEval(gts, dts_clean).evaluate()
    with_fp = COCOKeypointsEval(gts, dts_fp).evaluate()
    np.testing.assert_allclose(clean[0], 1.0, atol=1e-9)
    # the higher-scored FP precedes the TP on the PR curve -> AP must drop
    assert with_fp[0] < clean[0]
    # and the dict form with an explicit image index agrees exactly
    dict_form = run(gts, dts_fp, [1, 2])
    np.testing.assert_allclose(with_fp, dict_form, atol=1e-9)


def test_crowd_gt_absorbs_multiple_dts():
    """A crowd gt is ignore (pycocotools _prepare) and, unlike normal gts,
    can be matched by MANY detections — none of them become FPs, and the
    crowd never counts as a miss. Expected: perfect AP/AR from the single
    real pair, the two crowd detections notwithstanding."""
    P1, P2 = [(20, 20)], [(200, 200)]
    gts = [
        gt_ann(1, 1, P1),
        gt_ann(1, 2, P2, iscrowd=1),  # crowd with labeled kpts
    ]
    dts = [
        dt_ann(1, P1, 0.9),                      # exact match, OKS 1
        dt_ann(1, P2, 0.8),                      # absorbs into crowd
        dt_ann(1, [(201, 200)], 0.7),            # crowd already matched: still absorbed
    ]
    stats = run(gts, dts, [1])
    exp = np.array([1.0, 1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, -1.0])
    np.testing.assert_allclose(stats, exp, atol=1e-9)


def test_num_keypoints_zero_bbox_fallback():
    """gt with num_keypoints=0: ignore, and its OKS uses the bbox-distance
    fallback — a detection INSIDE the (expanded) bbox gets similarity 1 and
    is absorbed; one far outside is a genuine FP."""
    P1 = [(20, 20)]
    gts = [
        gt_ann(1, 1, P1),
        gt_ann(1, 2, [(0, 0)], num_keypoints=0, v=0,
               bbox=[200, 200, 40, 40], area=1600.0),
    ]
    # fallback expands bbox by 1x each side: [160, 360] x [160, 360]
    inside = [(220, 220)]
    far = [(900, 900)]
    ious = compute_oks_matrix([dt_ann(1, inside, 0.5)], [gts[1]])
    assert ious[0, 0] == 1.0  # inside expanded bbox -> zero distance -> OKS 1

    dts = [
        dt_ann(1, P1, 0.9),        # TP
        dt_ann(1, inside, 0.8),    # absorbed by ignore gt
        dt_ann(1, far, 0.7),       # FP (matches nothing)
    ]
    stats = run(gts, dts, [1])
    # npig=1; order: TP(0.9), absorbed(0.8, ignored), FP(0.7)
    # tps=[1,1], fps=[0,1] -> rc=[1,1], pr=[1,.5] -> envelope keeps q=1 at all
    # recall thresholds (searchsorted hits index 0) -> AP=1, AR=1
    exp = np.array([1.0, 1.0, 1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, -1.0])
    np.testing.assert_allclose(stats, exp, atol=1e-9)


def test_dt_outside_area_range_ignored():
    """An unmatched detection whose keypoint-extent area falls outside the
    range is ignored for that range (no FP) but IS an FP for 'all'. Junk
    scores above the true match so the FP actually bites: AP_all=0.5 via the
    precision envelope, AP_large=1.0 because the junk is area-ignored there."""
    # gt spread over 100x100 -> dt extent 10000 > 96^2? no: large is >9216.
    big = [(0, 0), (100, 100), (0, 100), (100, 0)]
    gts = [gt_ann(1, 1, big, area=10000.0)]
    junk = [(500, 500), (502, 502)]  # extent 4 -> area 4: outside large+medium
    dts = [
        dt_ann(1, junk, 0.95),  # unmatched; FP in 'all', ignored in 'large'
        dt_ann(1, big, 0.90),   # exact match
    ]
    stats = run(gts, dts, [1])
    # all: tps=[0,1] fps=[1,0]; rc=[0,1] pr=[0,.5]; envelope pr=[.5,.5];
    #   searchsorted(rc, thr, left): thr=0 -> 0, thr>0 -> 1 -> q=0.5 everywhere
    ap_all, ap_large = 0.5, 1.0
    exp = np.array([ap_all, ap_all, ap_all, -1.0, ap_large,
                    1.0, 1.0, 1.0, -1.0, 1.0])
    np.testing.assert_allclose(stats, exp, atol=1e-9)


def test_max_dets_truncation():
    """25 detections: 24 high-score junk + the only true match at rank 25.
    maxDets=20 truncation must drop the true match -> AP=AR=0. Without the
    truncation the match would land and AP would be positive."""
    P1 = [(20, 20)]
    gts = [gt_ann(1, 1, P1)]
    dts = [dt_ann(1, [(500 + 10 * j, 500)], 0.99 - 0.005 * j) for j in range(24)]
    dts.append(dt_ann(1, P1, 0.5))
    stats = run(gts, dts, [1])
    exp = np.array([0.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0, -1.0])
    np.testing.assert_allclose(stats, exp, atol=1e-9)


def test_duplicate_scores_mergesort_order():
    """Two detections with IDENTICAL scores in different images: the global
    sort is a stable mergesort, so concatenation (image-id) order decides
    which comes first, and AP depends on it. TP in image 1, FP in image 2:
    pr=[1, .5] -> AP = 51/101 (thresholds 0.00..0.50 see precision 1.0).
    If the order flipped, the envelope would give 0.5 -> AP = 25.5/101."""
    P1, P2 = [(20, 20)], [(40, 40)]
    gts = [gt_ann(1, 1, P1), gt_ann(2, 2, P2)]
    dts = [
        dt_ann(1, P1, 0.5),          # TP, image 1
        dt_ann(2, [(900, 900)], 0.5),  # FP, image 2, same score
    ]
    stats = run(gts, dts, [1, 2])
    ap = 51.0 / 101.0
    exp = np.array([ap, ap, ap, ap, -1.0, 0.5, 0.5, 0.5, 0.5, -1.0])
    np.testing.assert_allclose(stats, exp, atol=1e-9)

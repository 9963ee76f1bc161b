"""NumPy oracle of the reference AE decode semantics, used to verify the
jittable JAX decode (human_pose_tpu.ops.grouping) for parity.

Behavior mirrors /root/reference/src/keypoints/grouping.py (dict-based greedy
grouping with Munkres assignment, quarter-offset adjust, tag-distance refine)
re-expressed in plain NumPy with scipy's linear_sum_assignment standing in for
the Munkres solver (same rectangular padding with 1e10 columns).
"""

import numpy as np
from scipy.optimize import linear_sum_assignment

JOINTS_ORDER = [i - 1 for i in [1, 2, 3, 4, 5, 6, 7, 12, 13, 8, 9, 10, 11, 14, 15, 16, 17]]


def nms_np(hms, pool=5):
    # keep a value iff it equals its pool x pool window max (same semantics as
    # the original quadruple loop; maximum_filter makes production-size maps
    # feasible — 17 x 512 x 512 would take minutes in pure python)
    from scipy.ndimage import maximum_filter

    mx = maximum_filter(hms, size=(1, pool, pool), mode="constant", cval=-np.inf)
    return np.where(hms == mx, hms, 0.0).astype(hms.dtype)


def top_k_np(kpts_hms, tags_hms, m):
    k, h, w = kpts_hms.shape
    e = tags_hms.shape[-1]
    sup = nms_np(kpts_hms)
    flat = sup.reshape(k, -1)
    idxs = np.argsort(-flat, axis=1, kind="stable")[:, :m]
    scores = np.take_along_axis(flat, idxs, axis=1)
    x = idxs % w
    y = idxs // w
    coords = np.stack([x, y], -1).astype(np.int32)
    tags = np.take_along_axis(tags_hms.reshape(k, -1, e), idxs[..., None], axis=1)
    return tags, coords, scores


def match_by_tag_np(tags_k, coords_k, scores_k, num_kpts, max_num_people, det_thr, tag_thr):
    e = tags_k.shape[2]
    default = np.zeros((num_kpts, 3 + e))
    joint_dict = {}
    tag_dict = {}
    for i in range(num_kpts):
        idx = JOINTS_ORDER[i]
        tags = tags_k[idx]
        joints = np.concatenate(
            (coords_k[idx].astype(np.float64), scores_k[idx, :, None], tags), 1
        )
        mask = joints[:, 2] > det_thr
        tags = tags[mask]
        joints = joints[mask]
        if joints.shape[0] == 0:
            continue
        if i == 0 or len(joint_dict) == 0:
            for tag, joint in zip(tags, joints):
                key = tag[0]
                joint_dict.setdefault(key, np.copy(default))[idx] = joint
                tag_dict[key] = [tag]
        else:
            grouped_keys = list(joint_dict.keys())[:max_num_people]
            grouped_tags = [np.mean(tag_dict[kk], axis=0) for kk in grouped_keys]
            diff = joints[:, None, 3:] - np.array(grouped_tags)[None, :, :]
            diff_normed = np.linalg.norm(diff, ord=2, axis=2)
            diff_saved = np.copy(diff_normed)
            diff_normed = np.round(diff_normed) * 100 - joints[:, 2:3]
            num_added, num_grouped = diff.shape[:2]
            if num_added > num_grouped:
                diff_normed = np.concatenate(
                    (diff_normed, np.zeros((num_added, num_added - num_grouped)) + 1e10),
                    axis=1,
                )
            rows, cols = linear_sum_assignment(diff_normed)
            for row, col in zip(rows, cols):
                if row < num_added and col < num_grouped and diff_saved[row][col] < tag_thr:
                    key = grouped_keys[col]
                    joint_dict[key][idx] = joints[row]
                    tag_dict[key].append(tags[row])
                else:
                    key = tags[row][0]
                    joint_dict.setdefault(key, np.copy(default))[idx] = joints[row]
                    tag_dict[key] = [tags[row]]
    grouped = np.array(list(joint_dict.values())).astype(np.float32)
    if len(grouped) == 0:
        return np.zeros((0, num_kpts, 3 + e), np.float32)
    return grouped[:max_num_people]


def adjust_np(grouped, kpts_hms):
    _, h, w = kpts_hms.shape
    out = grouped.copy()
    for p in range(len(grouped)):
        for k in range(grouped.shape[1]):
            x, y, score = grouped[p, k, 0], grouped[p, k, 1], grouped[p, k, 2]
            if score == 0:
                continue
            xi, yi = int(x), int(y)
            hm = kpts_hms[k]
            nx = x + (0.25 if hm[yi, min(xi + 1, w - 1)] > hm[yi, max(xi - 1, 0)] else -0.25)
            ny = y + (0.25 if hm[min(yi + 1, h - 1), xi] > hm[max(yi - 1, 0), xi] else -0.25)
            out[p, k, 0] = nx + 0.5
            out[p, k, 1] = ny + 0.5
    return out


def refine_np(kpts_hms, tags_hms, person):
    k, h, w = kpts_hms.shape
    tags = []
    for i in range(k):
        if person[i, 2] > 0:
            x, y = person[i, :2].astype(np.int32)
            tags.append(tags_hms[i, y, x])
    if not tags:
        return person
    prev_tag = np.mean(tags, axis=0)
    out = person.copy()
    for i in range(k):
        hm = kpts_hms[i]
        dist = np.sqrt(((tags_hms[i] - prev_tag[None, None, :]) ** 2).sum(axis=2))
        diff = hm - np.round(dist)
        yy, xx = np.unravel_index(np.argmax(diff), (h, w))
        val = hm[yy, xx]
        nx = xx + 0.5 + (0.25 if hm[yy, min(xx + 1, w - 1)] > hm[yy, max(xx - 1, 0)] else -0.25)
        ny = yy + 0.5 + (0.25 if hm[min(yy + 1, h - 1), xx] > hm[max(yy - 1, 0), xx] else -0.25)
        if val > 0 and person[i, 2] == 0:
            out[i, 0] = nx
            out[i, 1] = ny
            out[i, 2] = val
    return out


def parse_np(kpts_hms, tags_hms, max_num_people=30, det_thr=0.1, tag_thr=1.0):
    num_kpts = kpts_hms.shape[0]
    tags_k, coords_k, scores_k = top_k_np(kpts_hms, tags_hms, max_num_people)
    grouped = match_by_tag_np(
        tags_k, coords_k, scores_k, num_kpts, max_num_people, det_thr, tag_thr
    )
    if len(grouped) == 0:
        coords = coords_k[:, 0].astype(np.float32)
        score = np.full((num_kpts, 1), 0.01, np.float32)
        tag = tags_k[:, 0].astype(np.float32)
        grouped = np.concatenate([coords, score, tag], axis=-1)[None]
    grouped = adjust_np(grouped, kpts_hms)
    person_scores = grouped[..., 2].mean(1)
    for p in range(len(grouped)):
        grouped[p] = refine_np(kpts_hms, tags_hms, grouped[p])
    return grouped, person_scores

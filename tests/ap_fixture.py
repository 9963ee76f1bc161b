"""Shared multi-person AP-parity fixture: corpus builder + trained weights IO.

Used by tests/test_ap_parity.py (loads the COMMITTED trained weights and
checks cross-framework AP) and scripts/train_ap_fixture.py (the one-time
offline trainer that produces those weights). Keeping the corpus generation
here guarantees the committed weights and the in-suite eval see bit-identical
images/annotations (everything is seeded).

Fixture semantics (calibrated in round 4, scripts/prof/prof_ap_multi.py):
TWO persons per image in top/bottom bands; joint identity is encoded by
color discs (convnet learns color -> joint), person identity by a backdrop
tint (AE tag head learns tint -> embedding, so grouping must genuinely
separate two tag clusters per image). Appearance is flip-TTA-coherent
(reference semantics /root/reference/src/keypoints/model.py:85-96): flip
pairs share a hue and differ by a mirror-sensitive white-dot glyph, so the
mirrored joint k looks like joint flip[k] — exactly what the channel permute
assumes.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

K, P_CAP, IN_SIZE = 17, 10, 64
N_IMAGES = 10  # 20 annotations -> AP quantization ~0.005/threshold-cell
WEIGHTS_PATH = Path(__file__).parent / "data" / "ap_fixture_weights.npz"


def make_learnable_fixture(root, gt, size: int = 96):
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


def build_corpus(root, n_images: int = N_IMAGES, size: int = 96):
    """Deterministic multi-person corpus: n_images x 2 persons."""
    from tests.test_data import make_coco_fixture

    gt = make_coco_fixture(root, n_images=n_images, size=size)
    return make_learnable_fixture(root, gt, size=size)


def train_batch_and_views(root, gt):
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


# -- trained-weights IO -------------------------------------------------------

def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_trained_variables(trained: dict, path: Path = WEIGHTS_PATH) -> None:
    """Save {'params', 'batch_stats'} as a compressed flat npz.

    Params are stored fp16 (~4.3 MB for the 2.15M-param C=8 net instead of
    8.6 fp32): BOTH pipelines in the parity test load the SAME rounded
    weights, so cross-framework parity is exactly preserved; the absolute AP
    of the sharply-memorized fixture is insensitive to 1e-3-relative weight
    rounding (verified by the offline trainer's probe before saving).
    batch_stats stay fp32 (running vars can be small; they are tiny arrays)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten({k: dict(v) for k, v in trained.items()})
    np.savez_compressed(
        path,
        **{
            k: v.astype(np.float16 if k.startswith("params/") else np.float32)
            for k, v in flat.items()
        },
    )


def load_trained_variables(path: Path = WEIGHTS_PATH) -> dict:
    """Load the committed trained fixture weights as jnp fp32 trees."""
    import jax.numpy as jnp

    if not path.exists():
        raise FileNotFoundError(
            f"{path} missing — regenerate with "
            "`python scripts/train_ap_fixture.py` (one-time offline training)"
        )
    with np.load(path) as z:
        flat = {k: jnp.asarray(z[k], jnp.float32) for k in z.files}
    return _unflatten(flat)

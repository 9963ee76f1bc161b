"""Generate a tiny synthetic COCO-keypoints tree for end-to-end smokes.

No real COCO data exists on this box (BASELINE.md), so hardware smokes of the
full training CLI (bin/train_keypoints.py) use this: a person_keypoints_*.json
plus JPEG images in the reference's directory layout
(/root/reference/scripts/prepare_coco.sh + save_coco_annots.py), with random
multi-person keypoint annotations and simple box segmentations. The dataset's
rank-0 pre-bake then produces the per-image yaml/npy files exactly as it
would for real COCO.

Usage:
    python scripts/make_synthetic_coco.py --root=/tmp/coco_smoke \
        [--train=16] [--val=8] [--size=256]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import cv2
import numpy as np


def make_split(root: Path, split: str, n_images: int, size: int, seed: int) -> None:
    rng = np.random.RandomState(seed)
    (root / "images" / split).mkdir(parents=True, exist_ok=True)
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        name = f"{i:012d}.jpg"
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / split / name), img)
        images.append({"id": i, "file_name": name, "height": size, "width": size})
        for _ in range(rng.randint(1, 4)):
            kpts = []
            for _k in range(17):
                kpts += [int(rng.randint(5, size - 5)), int(rng.randint(5, size - 5)), 2]
            x0, y0 = (int(v) for v in rng.randint(0, size // 2, 2))
            w = h = size // 3
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "category_id": 1,
                    "keypoints": kpts,
                    "num_keypoints": 17,
                    "iscrowd": 0,
                    "area": float(w * h),
                    "bbox": [float(x0), float(y0), float(w), float(h)],
                    "segmentation": [[x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h]],
                }
            )
            ann_id += 1
    with open(root / "annotations" / f"person_keypoints_{split}.json", "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    print(f"{split}: {n_images} images, {len(annotations)} annotations")


def main() -> None:
    root, n_train, n_val, size = Path("/tmp/coco_smoke"), 16, 8, 256
    for tok in sys.argv[1:]:
        if tok.startswith("--root="):
            root = Path(tok.split("=", 1)[1])
        elif tok.startswith("--train="):
            n_train = int(tok.split("=", 1)[1])
        elif tok.startswith("--val="):
            n_val = int(tok.split("=", 1)[1])
        elif tok.startswith("--size="):
            size = int(tok.split("=", 1)[1])
        else:
            raise SystemExit(f"unknown flag: {tok}")
    make_split(root, "train2017", n_train, size, seed=0)
    make_split(root, "val2017", n_val, size, seed=1)
    print(f"synthetic COCO tree at {root}")


if __name__ == "__main__":
    main()

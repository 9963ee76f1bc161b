"""Pre-bake COCO annotations to per-image yaml + crowd-mask npy files
(counterpart of reference scripts/save_coco_annots.py)."""
import sys

sys.path.insert(0, ".")
from human_pose_tpu.data import prebake_annotations

root = sys.argv[1] if len(sys.argv) > 1 else "data/COCO"
for split in ("train2017", "val2017"):
    prebake_annotations(root, split)

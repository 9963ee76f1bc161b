"""Eval-shape bucket analysis: jit-bucket count vs padding overhead.

COCO val2017's arbitrary aspect ratios hit resize_align_multi_scale's
64-multiple alignment (reference transforms/utils.py:60-86) and produce one
XLA compilation per distinct (h, w) — a compile storm on a cold cache
(~minutes/graph on a 1-core host). inference/models.py buckets shapes by
padding the 64-aligned input up to `pad_multiple` and masking the padded
region out of decode (valid_hw), trading padded-pixel compute for fewer
compilations.

No COCO on this box, so the shape sample below is a REPRESENTATIVE,
hand-curated list of common COCO image sizes (the dataset caps the long side
at 640; the weights are rough prevalence, not measured frequencies). The
bucket COUNTS are exact for any image set you substitute; the padding
overhead column estimates throughput cost on an HBM-bound forward (time ~
pixels).

Usage: python scripts/bucket_analysis.py [--input-size=512]
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from human_pose_tpu.data.affine import get_multi_scale_size  # noqa: E402

# (h, w, approx_weight) — typical COCO val2017 raw sizes. Long side <= 640.
COCO_LIKE_SHAPES = [
    (480, 640, 30), (640, 480, 12), (427, 640, 12), (640, 427, 5),
    (426, 640, 4), (640, 426, 2), (428, 640, 3), (640, 428, 1),
    (425, 640, 3), (375, 500, 3), (500, 375, 2), (333, 500, 2),
    (500, 333, 1), (612, 612, 2), (360, 640, 2), (640, 360, 1),
    (424, 640, 2), (640, 424, 1), (478, 640, 1), (640, 478, 1),
    (483, 640, 1), (361, 640, 1), (640, 361, 1), (429, 640, 1),
    (640, 429, 1), (422, 640, 1), (430, 640, 1), (640, 425, 1),
    (481, 640, 1), (640, 481, 1), (512, 640, 1), (640, 512, 1),
    (476, 640, 1), (640, 476, 1), (423, 640, 1), (336, 448, 1),
]


def aligned_size(h: int, w: int, input_size: int) -> tuple[int, int]:
    (w_r, h_r), _, _ = get_multi_scale_size(
        np.zeros((h, w, 3), np.uint8), input_size, 1.0, 1.0
    )
    return h_r, w_r


def bucket(h: int, w: int, m: int) -> tuple[int, int]:
    return (-(-h // m) * m, -(-w // m) * m)


def main(input_size: int = 512) -> None:
    aligned = [(aligned_size(h, w, input_size), wt) for h, w, wt in COCO_LIKE_SHAPES]
    total_wt = sum(wt for _, wt in aligned)
    base_pixels = sum(h * w * wt for (h, w), wt in aligned)

    print(f"input_size={input_size}, {len(COCO_LIKE_SHAPES)} raw shapes, "
          f"{len(set(s for s, _ in aligned))} aligned (64-mult) shapes\n")
    print(f"{'pad_multiple':>12} {'buckets':>8} {'pad overhead':>13} {'worst shape pad':>16}")
    for m in (64, 128, 192, 256, 320):
        buckets = Counter()
        padded_pixels = 0
        worst = 0.0
        for (h, w), wt in aligned:
            bh, bw = bucket(h, w, m)
            buckets[(bh, bw)] += wt
            padded_pixels += bh * bw * wt
            worst = max(worst, bh * bw / (h * w) - 1.0)
        overhead = padded_pixels / base_pixels - 1.0
        print(f"{m:>12} {len(buckets):>8} {overhead:>12.1%} {worst:>15.1%}")
    print(
        "\npad overhead ~ throughput cost on the HBM-bound forward; buckets ~ "
        "number of XLA compilations (each ~minutes cold on a 1-core host, "
        "seconds with a warm persistent cache). Decode correctness under "
        "padding is exact: the padded region is masked via valid_hw "
        "(inference/models.py), pinned by tests/test_inference.py."
    )
    print("\nper-bucket weights (pad_multiple=128):")
    buckets = Counter()
    for (h, w), wt in aligned:
        buckets[bucket(h, w, 128)] += wt
    for (bh, bw), wt in buckets.most_common():
        print(f"  {bh}x{bw}: {wt / total_wt:.1%}")


if __name__ == "__main__":
    size = 512
    for arg in sys.argv[1:]:
        if arg.startswith("--input-size="):
            size = int(arg.split("=")[1])
    main(size)

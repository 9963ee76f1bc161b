"""Training-target generation for bottom-up pose: Gaussian heatmaps + padded
joint arrays.

Counterpart of reference src/keypoints/datasets/coco.py:77-137
(HeatmapGenerator / JointsGenerator):

* ``HeatmapGenerator``: windowed 2-D Gaussian splat with np.maximum; window is
  6*sigma+3 wide centered at (3*sigma+1, 3*sigma+1); joints out of bounds or
  with vis<=0 are skipped. Output is channel-last [H, W, K].
* ``JointsGenerator``: clamp/validity -> integer coords with vis in {0,1},
  padded to a fixed [max_num_people, K, 3] int32 array (the reference keeps
  ragged per-sample lists; fixed shapes keep XLA happy, and the AE loss takes
  the pad's vis=0 as "absent").
"""

from __future__ import annotations

import numpy as np

from .native import HAVE_NATIVE, splat_heatmaps_native


class HeatmapGenerator:
    def __init__(self, num_kpts: int, size: int, sigma: float = 2.0):
        self.num_kpts = num_kpts
        self.h = self.w = size
        if sigma < 0:
            sigma = size / 64
        self.sigma = sigma
        span = np.arange(0, 6 * sigma + 3, 1, float)
        x0 = y0 = 3 * sigma + 1
        self.gauss = np.exp(
            -((span[None, :] - x0) ** 2 + (span[:, None] - y0) ** 2) / (2 * sigma**2)
        )

    def __call__(self, joints: np.ndarray) -> np.ndarray:
        """joints: [num_people, K, 3] (x, y, vis). Returns [H, W, K] float32."""
        if HAVE_NATIVE and len(joints):
            return splat_heatmaps_native(
                np.asarray(joints, np.int32), self.h, self.sigma
            )
        hms = np.zeros((self.h, self.w, self.num_kpts), dtype=np.float32)
        s = self.sigma
        for person in joints:
            for idx in range(self.num_kpts):
                x, y, vis = person[idx]
                if vis <= 0 or x < 0 or y < 0 or x >= self.w or y >= self.h:
                    continue
                xmin = int(np.round(x - 3 * s - 1))
                ymin = int(np.round(y - 3 * s - 1))
                xmax = int(np.round(x + 3 * s + 2))
                ymax = int(np.round(y + 3 * s + 2))
                # clip the gaussian window against the map
                gx0, gx1 = max(0, -xmin), min(xmax, self.w) - xmin
                gy0, gy1 = max(0, -ymin), min(ymax, self.h) - ymin
                mx0, mx1 = max(0, xmin), min(xmax, self.w)
                my0, my1 = max(0, ymin), min(ymax, self.h)
                hms[my0:my1, mx0:mx1, idx] = np.maximum(
                    hms[my0:my1, mx0:mx1, idx], self.gauss[gy0:gy1, gx0:gx1]
                )
        return hms


class JointsGenerator:
    def __init__(self, size: int, max_num_people: int = 30):
        self.h = self.w = size
        self.max_num_people = max_num_people

    def __call__(self, joints: np.ndarray) -> np.ndarray:
        """joints: [num_people, K, 3] float. Returns [max_num_people, K, 3]
        int32 with invalid joints zeroed and empty persons dropped."""
        num_people, k = joints.shape[:2]
        out = np.zeros((num_people, k, 3), np.int32)
        for i in range(num_people):
            for j in range(k):
                x, y, vis = int(joints[i, j, 0]), int(joints[i, j, 1]), joints[i, j, 2]
                if vis > 0 and 0 <= x < self.w and 0 <= y < self.h:
                    out[i, j] = (x, y, 1)
        keep = out.sum(axis=(1, 2)) > 0
        out = out[keep][: self.max_num_people]
        padded = np.zeros((self.max_num_people, k, 3), np.int32)
        padded[: len(out)] = out
        return padded

"""Heatmap resizing / multi-stage aggregation, NHWC.

Counterpart of reference src/keypoints/results.py:46-67 (torch bilinear
interpolate with align_corners=False — jax.image.resize's half-pixel-center
'linear' method computes the same sampling) and the stage aggregation in
results.py:225-234.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(hms: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize of [N, H, W, C] maps to (h, w); matches torch
    F.interpolate(mode='bilinear', align_corners=False)."""
    n, _, _, c = hms.shape
    return jax.image.resize(hms, (n, h, w, c), method="linear")


def match_heatmaps_size(heatmaps: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """Resize all stages to the last (largest) stage's spatial size
    (reference results.py:46-54)."""
    h, w = heatmaps[-1].shape[1:3]
    return [resize_bilinear(hm, h, w) for hm in heatmaps[:-1]] + [heatmaps[-1]]


def average_stages(heatmaps: list[jnp.ndarray]) -> jnp.ndarray:
    """Mean over the stage list after size matching (results.py:225-226)."""
    matched = match_heatmaps_size(heatmaps)
    return sum(matched) / len(matched)

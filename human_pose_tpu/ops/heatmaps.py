"""Heatmap resizing / multi-stage aggregation, NHWC.

Counterpart of reference src/keypoints/results.py:46-67 (torch bilinear
interpolate with align_corners=False — jax.image.resize's half-pixel-center
'linear' method computes the same sampling) and the stage aggregation in
results.py:225-234.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(hms: jnp.ndarray, h: int, w: int, channel_major: bool = False) -> jnp.ndarray:
    """Bilinear resize of [N, H, W, C] (or [N, C, H, W] with
    ``channel_major=True``) maps to (h, w); matches torch
    F.interpolate(mode='bilinear', align_corners=False).

    The two layouts produce bit-identical values per element (the resize is
    independent per channel: same taps, same weights, same accumulation) —
    channel-major exists because relayout-then-resize is far cheaper than
    resize-then-relayout on TPU when upscaling (see ops/decode.py)."""
    n = hms.shape[0]
    if channel_major:
        return jax.image.resize(hms, (n, hms.shape[1], h, w), method="linear")
    return jax.image.resize(hms, (n, h, w, hms.shape[3]), method="linear")


def match_heatmaps_size(heatmaps: list[jnp.ndarray], channel_major: bool = False) -> list[jnp.ndarray]:
    """Resize all stages to the last (largest) stage's spatial size
    (reference results.py:46-54)."""
    h, w = heatmaps[-1].shape[2:4] if channel_major else heatmaps[-1].shape[1:3]
    return [
        resize_bilinear(hm, h, w, channel_major) for hm in heatmaps[:-1]
    ] + [heatmaps[-1]]


def average_stages(heatmaps: list[jnp.ndarray], channel_major: bool = False) -> jnp.ndarray:
    """Mean over the stage list after size matching (results.py:225-226)."""
    matched = match_heatmaps_size(heatmaps, channel_major)
    return sum(matched) / len(matched)

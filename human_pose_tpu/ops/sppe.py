"""Single-person (SPPE) heatmap decode.

Counterpart of the reference's ``SPPEHeatmapParser``
(/root/reference/src/keypoints/grouping.py:10-52): per-keypoint argmax over
the detection heatmap gives integer (x, y) and the heatmap value as score;
one person per image, no detection threshold applied (the reference's
threshold mask is commented out — parity keeps all joints and leaves
filtering to the caller via ``det_thr`` downstream).

TPU notes: a [N,H,W,K] argmax is one XLA reduce per image — no loops. Ties
resolve to the FIRST (row-major) maximum, matching NumPy/torch argmax.
"""

from __future__ import annotations

import jax.numpy as jnp


def sppe_parse(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Decode single-person joints from detection heatmaps.

    Args:
      heatmaps: ``[N, H, W, K]`` detection heatmaps (NHWC).

    Returns:
      joints ``[N, 1, K, 3]`` float32 — (x, y, score) per keypoint, coords in
      heatmap pixel space (integer-valued).
    """
    n, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(n, h * w, k)
    idx = jnp.argmax(flat, axis=1)  # [N, K], first max on ties
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    score = jnp.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0]
    joints = jnp.stack([x, y, score.astype(jnp.float32)], axis=-1)
    return joints[:, None]  # one person

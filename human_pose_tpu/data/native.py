"""Dispatch layer for the native (C++) data-pipeline kernels.

``native/hp_native.cpp`` implements the host-side per-sample hot loops —
Gaussian heatmap splatting and COCO RLE decoding — at C speed with the GIL
released (so the loader's worker threads actually parallelize). Build with
``make native``; everything degrades gracefully to the NumPy paths when the
extension is absent.
"""

from __future__ import annotations

import numpy as np

try:
    from . import hp_native as _ext  # built into the package dir (make native)

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build
    try:
        import hp_native as _ext  # or anywhere on sys.path

        HAVE_NATIVE = True
    except ImportError:
        _ext = None
        HAVE_NATIVE = False


def splat_heatmaps_native(joints: np.ndarray, size: int, sigma: float) -> np.ndarray:
    """joints int32 [P, K, 3] -> float32 [size, size, K] (max-combined
    Gaussian splat, reference HeatmapGenerator semantics)."""
    p, k, _ = joints.shape
    buf = _ext.splat_heatmaps(
        np.ascontiguousarray(joints, np.int32).tobytes(), p, k, size, float(sigma)
    )
    return np.frombuffer(buf, np.float32).reshape(size, size, k).copy()


def rle_decode_native(counts, h: int, w: int) -> np.ndarray:
    """Run lengths -> uint8 [h, w] mask (column-major runs)."""
    arr = np.ascontiguousarray(counts, np.int32)
    buf = _ext.rle_decode(arr.tobytes(), len(arr), h, w)
    return np.frombuffer(buf, np.uint8).reshape(h, w).copy()

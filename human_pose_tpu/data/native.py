"""Dispatch layer for the native (C++) data-pipeline kernels.

``native/hp_native.cpp`` implements the host-side per-sample hot loops —
Gaussian heatmap splatting and COCO RLE decoding — at C speed with the GIL
released (so the loader's worker threads actually parallelize). The
extension is built on demand at first import (best-effort, lock-guarded so
parallel workers don't race; ``HP_NO_NATIVE_BUILD=1`` disables); everything
degrades gracefully to the NumPy paths — with a loud one-time warning — when
the build fails. ``make native`` still builds it explicitly.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

import numpy as np

_log = logging.getLogger(__name__)

_PKG_DIR = Path(__file__).resolve().parent
_SRC_DIR = _PKG_DIR.parent.parent / "native"


def _src_stamp() -> str:
    src = _SRC_DIR / "hp_native.cpp"
    st = src.stat()
    return f"{st.st_mtime_ns}:{st.st_size}"


def _try_build() -> bool:
    """Best-effort in-tree build of hp_native into the package dir.

    Serialized across processes with an exclusive flock (xdist workers /
    DataLoader processes may import concurrently on a fresh checkout).
    A failure is recorded in ``native/.build.failed`` keyed on the source
    mtime so subsequent processes skip the (up to 300 s) rebuild attempt
    instead of each re-paying it behind the lock; editing the source (or
    deleting the marker) re-enables the build. Returns True if a build
    product now exists.
    """
    if os.environ.get("HP_NO_NATIVE_BUILD") == "1":
        return False
    if not (_SRC_DIR / "hp_native.cpp").exists():  # installed without sources
        return False
    import fcntl
    import subprocess

    lock_path = _SRC_DIR / ".build.lock"
    failed_marker = _SRC_DIR / ".build.failed"
    try:
        stamp = _src_stamp()
        if failed_marker.exists() and failed_marker.read_text().strip() == stamp:
            _log.warning(
                "hp_native build previously failed for this source "
                "(native/.build.failed); skipping rebuild — delete the marker "
                "or touch native/hp_native.cpp to retry"
            )
            return False
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)  # blocks while another proc builds
            if list(_PKG_DIR.glob("hp_native*.so")):
                return True  # someone else just built it
            if failed_marker.exists() and failed_marker.read_text().strip() == stamp:
                return False  # another proc just failed on the same source
            _log.info("building native hp_native extension (one-time) ...")
            proc = subprocess.run(
                [sys.executable, "setup.py", "build_ext", "--inplace", "-q"],
                cwd=_SRC_DIR, capture_output=True, text=True, timeout=300,
            )
            if proc.returncode != 0:
                _log.warning("hp_native build failed:\n%s", proc.stderr[-2000:])
                failed_marker.write_text(stamp)
                return False
            built = sorted(_SRC_DIR.glob("hp_native*.so"))
            if not built:
                failed_marker.write_text(stamp)
                return False
            import shutil

            shutil.copy2(built[-1], _PKG_DIR / built[-1].name)
            failed_marker.unlink(missing_ok=True)
            return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _log.warning("hp_native build errored: %s", e)
        return False


def _import_ext():
    try:
        from . import hp_native as ext  # built into the package dir

        return ext
    except ImportError:
        try:
            import hp_native as ext  # or anywhere on sys.path

            return ext
        except ImportError:
            return None


_ext = _import_ext()
if _ext is None and _try_build():
    _ext = _import_ext()
HAVE_NATIVE = _ext is not None
if HAVE_NATIVE:
    _log.info("data pipeline: native C++ splat/RLE path active (hp_native)")
else:
    _log.warning(
        "data pipeline: hp_native extension unavailable — falling back to the "
        "~63x slower NumPy heatmap-splat/RLE path (run `make native`, check a "
        "C++ toolchain is present, or set HP_NO_NATIVE_BUILD=1 to silence)"
    )


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

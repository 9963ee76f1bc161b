"""Native C++ data-pipeline kernels vs the pure-Python fallbacks."""

import numpy as np
import pytest

from human_pose_tpu.data import native


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="hp_native not built (make native)")
def test_splat_matches_python():
    from human_pose_tpu.data.targets import HeatmapGenerator

    rng = np.random.RandomState(0)
    size, k, p = 64, 17, 6
    joints = np.stack(
        [
            rng.randint(-2, size + 2, (p, k)),
            rng.randint(-2, size + 2, (p, k)),
            rng.randint(0, 3, (p, k)),
        ],
        axis=-1,
    ).astype(np.int32)
    gen = HeatmapGenerator(k, size, sigma=2.0)
    nat = native.splat_heatmaps_native(joints, size, 2.0)

    # force the python path
    import human_pose_tpu.data.targets as T

    orig = T.HAVE_NATIVE
    T.HAVE_NATIVE = False
    try:
        ref = gen(joints)
    finally:
        T.HAVE_NATIVE = orig
    np.testing.assert_allclose(nat, ref, atol=1e-6)


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="hp_native not built")
def test_rle_matches_python():
    rng = np.random.RandomState(1)
    h, w = 37, 53
    # random runs summing to h*w
    runs = []
    left = h * w
    while left > 0:
        r = int(rng.randint(1, 50))
        runs.append(min(r, left))
        left -= runs[-1]
    nat = native.rle_decode_native(np.asarray(runs, np.int32), h, w)
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in runs:
        flat[pos : pos + c] = val
        pos += c
        val = 1 - val
    ref = flat.reshape(w, h).T
    np.testing.assert_array_equal(nat, ref)


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="hp_native not built")
def test_splat_speedup_measured():
    """The native path should beat the python loop comfortably."""
    import time

    from human_pose_tpu.data.targets import HeatmapGenerator
    import human_pose_tpu.data.targets as T

    rng = np.random.RandomState(2)
    size, k, p = 128, 17, 30
    joints = np.stack(
        [
            rng.randint(0, size, (p, k)),
            rng.randint(0, size, (p, k)),
            np.ones((p, k), np.int64),
        ],
        axis=-1,
    ).astype(np.int32)
    gen = HeatmapGenerator(k, size, sigma=2.0)

    # best-of-3 to be robust against CPU contention on the 1-core CI host
    t_native = min(
        min(time.perf_counter() - t0
            for t0 in [time.perf_counter()] if (gen(joints) is not None))
        for _ in range(3)
    )
    orig = T.HAVE_NATIVE
    T.HAVE_NATIVE = False
    try:
        t0 = time.perf_counter()
        ref = gen(joints)
        t_python = time.perf_counter() - t0
    finally:
        T.HAVE_NATIVE = orig
    nat = gen(joints)
    np.testing.assert_allclose(nat, ref, atol=1e-6)
    assert t_native < t_python, (t_native, t_python)

"""Decode parity against the reference's ACTUAL MPPEHeatmapParser.

tests/oracle_decode.py is this repo's NumPy re-expression of the reference
grouping semantics; this suite removes the re-expression from the trust chain
by running the reference's own parser (/root/reference/src/keypoints/
grouping.py:62-283, read-only import, CPU torch) on the same synthetic scenes
and comparing with the fixed-slot JAX decode (ops/grouping.parse).

The reference's module-level ``from munkres import Munkres`` is satisfied with
a scipy ``linear_sum_assignment``-backed shim — an INDEPENDENT optimal
assignment solver. On the reference's cost matrices (columns pre-padded with
1e10, grouping.py:126-128) scipy's rectangular assignment and Munkres'
zero-pad-to-square scheme have the same optima; scenes use well-separated
per-person tags so the optimum is unique and solver tie-breaks cannot differ
(see test_grouping_production.py docstrings for why random-tag dense scenes
have solver-defined co-optimal splits).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "src").exists(), reason="reference checkout not available"
)

from tests.test_grouping_production import synth_scene  # noqa: E402

K, H, W, M = 17, 96, 160, 30
DET_THR, TAG_THR = 0.1, 1.0


@pytest.fixture(scope="module")
def ref_grouping():
    """Import the reference grouping module with a scipy-backed munkres shim
    (the munkres package is not in this image)."""
    if "munkres" not in sys.modules:
        from scipy.optimize import linear_sum_assignment

        class Munkres:
            def compute(self, cost):
                rows, cols = linear_sum_assignment(np.asarray(cost))
                return list(zip(rows.tolist(), cols.tolist()))

        shim = types.ModuleType("munkres")
        shim.Munkres = Munkres
        sys.modules["munkres"] = shim
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import src.keypoints.grouping as ref_grouping

    return ref_grouping


def run_reference(ref_grouping, kpts, tags, m=M, det_thr=DET_THR, tag_thr=TAG_THR):
    parser = ref_grouping.MPPEHeatmapParser(
        num_kpts=kpts.shape[0], max_num_people=m, det_thr=det_thr, tag_thr=tag_thr
    )
    joints, scores = parser.parse(
        torch.from_numpy(kpts.copy()), torch.from_numpy(tags.copy())
    )
    return np.asarray(joints), np.asarray(scores)


def run_ours(kpts, tags, m=M, det_thr=DET_THR, tag_thr=TAG_THR):
    import jax.numpy as jnp

    from human_pose_tpu.ops import grouping

    joints, scores, valid = grouping.parse(
        jnp.asarray(kpts), jnp.asarray(tags), max_num_people=m,
        det_thr=det_thr, tag_thr=tag_thr,
    )
    valid = np.asarray(valid)
    return np.asarray(joints)[valid], np.asarray(scores)[valid]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_parse_matches_reference_parser(ref_grouping, seed):
    """Production shape (17 joints, 96x160, E=2 stacked flip tags, 12
    persons): full-row parity incl. tag columns and person scores."""
    kpts, tags = synth_scene(
        seed, tag_values=[2.5 * p - 14.0 for p in range(12)], tag_jitter=0.01
    )
    ref_joints, ref_scores = run_reference(ref_grouping, kpts, tags)
    our_joints, our_scores = run_ours(kpts, tags)
    assert our_joints.shape == ref_joints.shape, (
        f"person count: {our_joints.shape} vs {ref_joints.shape}"
    )
    np.testing.assert_allclose(our_joints, ref_joints, atol=1e-3)
    np.testing.assert_allclose(our_scores, ref_scores, atol=1e-4)


def test_parse_matches_reference_fallback_person(ref_grouping):
    """No detection clears det_thr -> the reference synthesizes a single
    best-candidate person with score 0.01 (grouping.py:262-269)."""
    rng = np.random.RandomState(5)
    kpts = rng.rand(K, 64, 64).astype(np.float32) * 0.05  # all below det_thr
    tags = rng.randn(K, 64, 64, 2).astype(np.float32)
    ref_joints, ref_scores = run_reference(ref_grouping, kpts, tags)
    our_joints, our_scores = run_ours(kpts, tags)
    assert our_joints.shape == ref_joints.shape == (1, K, 3 + 2)
    np.testing.assert_allclose(our_joints, ref_joints, atol=1e-3)
    np.testing.assert_allclose(our_scores, ref_scores, atol=1e-4)


def test_parse_matches_reference_single_tag_dim(ref_grouping):
    """E=1 (no flip TTA): the reference's refine takes the 3-dim tags path
    (grouping.py:205-206)."""
    kpts, tags = synth_scene(
        9, e=1, n_persons=6, tag_values=[4.0 * p - 10.0 for p in range(6)]
    )
    ref_joints, ref_scores = run_reference(ref_grouping, kpts, tags)
    our_joints, our_scores = run_ours(kpts, tags)
    assert our_joints.shape == ref_joints.shape
    np.testing.assert_allclose(our_joints, ref_joints, atol=1e-3)
    np.testing.assert_allclose(our_scores, ref_scores, atol=1e-4)


def test_parse_matches_reference_person_cap(ref_grouping):
    """More tag clusters than max_num_people: parity on WHICH persons survive
    the cap truncation (grouping.py:144-145). Unique separated tags keep the
    assignment optimum unique so the comparison is well-defined."""
    m_small = 8
    kpts, tags = synth_scene(
        13, n_persons=20, miss_p=0.3,
        tag_values=[3.0 * p - 28.0 for p in range(20)], tag_jitter=0.01,
    )
    ref_joints, ref_scores = run_reference(ref_grouping, kpts, tags, m=m_small)
    our_joints, our_scores = run_ours(kpts, tags, m=m_small)
    assert len(our_joints) == len(ref_joints) == m_small
    np.testing.assert_allclose(our_joints[..., :3], ref_joints[..., :3], atol=1e-3)


def test_sppe_parse_matches_reference(ref_grouping):
    """Single-person argmax decode (SPPEHeatmapParser, grouping.py:10-52)."""
    from human_pose_tpu.ops.sppe import sppe_parse

    rng = np.random.RandomState(21)
    hms = rng.rand(1, K, 48, 64).astype(np.float32)
    parser = ref_grouping.SPPEHeatmapParser(num_kpts=K)
    ref_joints = parser.parse(torch.from_numpy(hms.copy()))
    ours = np.asarray(sppe_parse(hms[0].transpose(1, 2, 0)[None])[0])
    assert ours.shape == ref_joints.shape == (1, K, 3)
    np.testing.assert_allclose(ours, ref_joints, atol=1e-5)

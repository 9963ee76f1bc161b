"""Pipeline parallelism — parallel/pipeline.py.

Pins: (1) the 4-segment pipelined forward reproduces the monolithic
``model.apply`` outputs (both compute layouts), (2) segments really live on
distinct devices, (3) microbatching concatenates correctly, (4) bad
partitions are rejected."""

import jax
import numpy as np
import pytest

from human_pose_tpu.models import HigherHRNet
from human_pose_tpu.parallel.pipeline import (
    DEFAULT_PARTITION,
    PipelinedModel,
    build_units,
)

from .test_spatial import TINY


def _model_and_vars(s2d: bool):
    model = HigherHRNet(s2d=s2d, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    return model, variables


@pytest.mark.parametrize("s2d", [False, True])
def test_pipeline_matches_monolithic(s2d):
    model, variables = _model_and_vars(s2d)
    images = np.random.RandomState(0).rand(4, 64, 64, 3).astype(np.float32)
    ref_hms, ref_tags = model.apply(variables, images, train=False)

    pipe = PipelinedModel(model, variables)
    (hms, tags) = pipe(images, microbatch_size=2)

    assert len(pipe.segments) == len(DEFAULT_PARTITION)
    devs = {dev.id for _, _, dev in pipe.segments}
    assert len(devs) == len(DEFAULT_PARTITION), "segments share a device"
    for a, b in zip(hms, ref_hms):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tags), np.asarray(ref_tags), atol=1e-5)


def test_unit_names_cover_model():
    model, _ = _model_and_vars(False)
    names = [u.name for u in build_units(model)]
    assert names == ["stem", "stage1", "stage2", "stage3", "stage4", "head"]
    flat = [n for seg in DEFAULT_PARTITION for n in seg]
    assert sorted(flat) == sorted(names)


def test_pipeline_rejects_bad_args():
    model, variables = _model_and_vars(False)
    with pytest.raises(ValueError, match="unknown units"):
        PipelinedModel(model, variables, partition=(("stem", "nope"),))
    with pytest.raises(ValueError, match="devices"):
        PipelinedModel(
            model, variables, partition=(("stem",), ("head",)),
            devices=jax.devices()[:1],
        )
    pipe = PipelinedModel(model, variables, partition=(("stem", "stage1", "stage2", "stage3", "stage4", "head"),))
    with pytest.raises(ValueError, match="divisible"):
        pipe(np.zeros((3, 64, 64, 3), np.float32), microbatch_size=2)


def test_partition_for_covers_all_units():
    from human_pose_tpu.parallel.pipeline import partition_for

    for n in range(1, 7):
        part = partition_for(n)
        assert len(part) == n
        flat = [u for seg in part for u in seg]
        assert sorted(flat) == sorted(
            ["stem", "stage1", "stage2", "stage3", "stage4", "head"]
        )
    with pytest.raises(ValueError, match="1-6"):
        partition_for(7)


@pytest.mark.parametrize("use_flip", [False, True])
def test_pipelined_inference_model_parity(use_flip):
    """InferenceKeypointsModel(pipeline_devices=N) must decode identically to
    the monolithic model — the full serving surface (forward_scale through
    BatchedKeypointsPredictor), incl. the flip pass riding the pipeline as a
    second microbatch."""
    from human_pose_tpu.inference.models import InferenceKeypointsModel
    from human_pose_tpu.inference.serving import BatchedKeypointsPredictor

    model, variables = _model_and_vars(False)
    kw = dict(det_thr=0.05, tag_thr=0.5, use_flip=use_flip, input_size=64)
    mono = InferenceKeypointsModel(model, variables, **kw)
    piped = InferenceKeypointsModel(model, variables, pipeline_devices=3, **kw)
    assert piped._pipe is not None and len(piped._pipe.segments) == 3

    image = (np.random.RandomState(1).rand(80, 112, 3) * 255).astype(np.uint8)
    r_mono = mono(image)
    r_pipe = piped(image)
    np.testing.assert_allclose(r_pipe.kpts_coords, r_mono.kpts_coords, atol=1e-4)
    np.testing.assert_allclose(r_pipe.obj_scores, r_mono.obj_scores, atol=1e-5)

    # batched serving path. The batch>1 pipeline splits into per-segment
    # microbatches (different XLA programs than the monolithic bs-2 forward),
    # so decoded persons can differ by fp tie-flips on these random-weight
    # near-degenerate heatmaps — pin the decode INPUTS tightly instead, and
    # run the predictor end-to-end as a plumbing check.
    p_mono = BatchedKeypointsPredictor(mono)
    p_pipe = BatchedKeypointsPredictor(piped)
    reqs = [p_mono.prepare(image) for _ in range(2)]
    import jax.numpy as jnp

    xb = jnp.asarray(np.stack([np.asarray(r.x)[0] for r in reqs]))
    hw = (xb.shape[1], xb.shape[2])
    avg_m, tags_m = mono.forward_scale(xb, hw)
    avg_p, tags_p = piped.forward_scale(xb, hw)
    np.testing.assert_allclose(np.asarray(avg_p), np.asarray(avg_m), atol=1e-4)
    for tm, tp_ in zip(tags_m, tags_p):
        np.testing.assert_allclose(np.asarray(tp_), np.asarray(tm), atol=1e-4)

    out_p = p_pipe.predict([p_pipe.prepare(image) for _ in range(2)])
    assert len(out_p) == 2
    for a in out_p:
        assert a["num_people"] == len(a["people"])
        for person in a["people"]:
            assert np.asarray(person["keypoints"]).shape[-1] == 3


def test_batched_eval_rejects_pipelined_model():
    """Batched eval goes through the monolithic jitted forward; a model built
    with pipeline_devices must be rejected, not silently run un-pipelined."""
    from human_pose_tpu.inference.batched_eval import BatchedKeypointsEvaluator
    from human_pose_tpu.inference.models import InferenceKeypointsModel

    model, variables = _model_and_vars(False)
    piped = InferenceKeypointsModel(
        model, variables, input_size=64, pipeline_devices=2
    )
    with pytest.raises(ValueError, match="pipeline_devices"):
        BatchedKeypointsEvaluator(piped, batch_size=2)


def test_pipeline_microbatch_sizing():
    """Batched pipeline calls must split into enough microbatches to fill the
    segments (overlap), while staying equal-size divisors (one jit shape)."""
    from human_pose_tpu.inference.models import _pipeline_microbatch

    assert _pipeline_microbatch(8, 4) == 2    # 4 microbatches fill 4 segments
    assert _pipeline_microbatch(16, 3) == 4   # ceil(16/3)=6 -> divisor 4
    assert _pipeline_microbatch(6, 3) == 2
    assert _pipeline_microbatch(1, 4) == 1
    assert _pipeline_microbatch(3, 4) == 1    # prime: per-sample microbatches
    assert _pipeline_microbatch(4, 1) == 4    # single segment: whole batch

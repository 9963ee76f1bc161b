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

"""Inference models: keypoints single/multi-scale + flip TTA, classification
top-5, result plotting, COCO detection export, StableHLO/weights export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.inference import (
    InferenceClassificationModel,
    InferenceKeypointsModel,
)
from human_pose_tpu.models import ClassificationHRNet, HigherHRNet
from human_pose_tpu.utils.export import export_stablehlo, export_weights_npz

TINY = dict(num_blocks_per_stage=(1, 1, 1, 1), num_units=1)


@pytest.fixture(scope="module")
def kpts_model():
    model = HigherHRNet(num_kpts=17, C=8, num_deconv_resid_blocks=1, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return model, dict(variables)


def test_keypoints_inference_single_scale(kpts_model):
    model, variables = kpts_model
    im = InferenceKeypointsModel(model, variables, input_size=128, max_num_people=5)
    raw = (np.random.RandomState(0).rand(200, 300, 3) * 255).astype(np.uint8)
    result = im(raw)
    # 64-aligned input
    assert im.model_input_shape[0] % 64 == 0 and im.model_input_shape[1] % 64 == 0
    assert result.kpts_coords.shape[1:] == (17, 2)
    dets = result.to_coco_detections(image_id=42)
    if dets:
        assert dets[0]["image_id"] == 42
        assert len(dets[0]["keypoints"]) == 51
    plots = result.plot()
    assert set(plots) == {"heatmaps", "connections", "associative_embedding"}


def test_keypoints_inference_flip_and_multiscale(kpts_model):
    model, variables = kpts_model
    im = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5, use_flip=True
    )
    raw = (np.random.RandomState(1).rand(160, 160, 3) * 255).astype(np.uint8)
    result = im(raw, scales=(0.5, 1.0))
    # flip TTA stacks a second tag embedding
    assert result.kpts_tags.shape[-1] == 2
    # tags/decode geometry come from the scale-1 pass: its absence is an
    # explicit error, not a None-crash deep inside the jitted decode
    with pytest.raises(ValueError, match="must include 1.0"):
        im(raw, scales=(0.5, 2.0))


def test_multiscale_config_plumbing(kpts_model):
    """inference.scales reaches the model as its default TTA scales
    (BASELINE.md target config: multi-scale 0.5/1/2 TTA eval)."""
    from human_pose_tpu.configs.base import InferenceConfig
    from human_pose_tpu.configs.cli import update_config
    from human_pose_tpu.configs.structured import structure

    merged = update_config({"inference": {}}, ["--inference.scales=[0.5,1.0]"])
    inf = structure(merged["inference"], InferenceConfig)
    assert inf.scales == [0.5, 1.0]

    model, variables = kpts_model
    im = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5,
        scales=tuple(inf.scales),
    )
    raw = (np.random.RandomState(2).rand(160, 160, 3) * 255).astype(np.uint8)
    result = im(raw)  # defaults to the configured multi-scale TTA
    assert im.scales == (0.5, 1.0)
    assert result.kpts_coords.shape[1:] == (17, 2)


def test_classification_inference():
    model = ClassificationHRNet(C=8, num_classes=10, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    im = InferenceClassificationModel(
        model, dict(variables), labels=[f"c{i}" for i in range(10)], input_size=64
    )
    raw = (np.random.RandomState(2).rand(100, 120, 3) * 255).astype(np.uint8)
    result = im(raw)
    assert result.probs.shape == (10,)
    assert abs(result.probs.sum() - 1.0) < 1e-4
    assert "top_probs" in result.plot()


def test_export(tmp_path, kpts_model):
    model, variables = kpts_model
    export_weights_npz(variables, tmp_path / "w.npz")
    loaded = np.load(tmp_path / "w.npz")
    assert len(loaded.files) > 50
    export_stablehlo(model, variables, (64, 64, 3), tmp_path / "model.stablehlo")
    assert (tmp_path / "model.stablehlo").stat().st_size > 1000


def test_pad_multiple_bucketing(kpts_model):
    """Shape-bucketing padding: padded shape is bucketed, the decode never
    places detections inside the pad region, and the back-projection uses the
    valid (unpadded) geometry. (Exact equality with the unpadded path is NOT
    expected: zero input padding perturbs activations near the pad edge —
    see InferenceKeypointsModel docstring.)"""
    model, variables = kpts_model
    raw = (np.random.RandomState(5).rand(150, 260, 3) * 255).astype(np.uint8)
    padded = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5, pad_multiple=256
    )
    r1 = padded(raw)
    assert padded.model_input_shape[0] % 256 == 0
    assert padded.model_input_shape[1] % 256 == 0
    # cropped plots/back-projection use the valid region
    assert r1.model_input_image.shape[0] % 64 == 0
    assert r1.model_input_image.shape[:2] != padded.model_input_shape
    # all detections land inside the raw image bounds (pad region suppressed)
    if len(r1.kpts_coords):
        h, w = raw.shape[:2]
        sc = r1.kpts_scores > 0.1
        assert (r1.kpts_coords[sc][:, 0] <= w * 1.2).all()
        assert (r1.kpts_coords[sc][:, 1] <= h * 1.2).all()


def test_model_cost_and_param_table(kpts_model):
    from human_pose_tpu.utils import count_params, model_cost, param_table

    model, variables = kpts_model
    assert count_params(variables["params"]) > 10_000
    table = param_table(variables["params"])
    assert "TOTAL" in table and "backbone" in table
    cost = model_cost(model, (64, 64, 3))
    assert cost["flops"] > 1e6
    assert cost["bytes_accessed"] > 1e5
    assert cost["params"] == count_params(variables["params"])

"""Compact inference inputs (inference.compact_inputs): uint8 pixels are
shipped to the device and normalized inside the jitted forward — identical
decode to the fp32 host-normalize path at pad_multiple=64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.inference import InferenceKeypointsModel
from human_pose_tpu.models import HigherHRNet

TINY = dict(num_blocks_per_stage=(1, 1, 1, 1), num_units=1)


@pytest.fixture(scope="module")
def kpts_model():
    model = HigherHRNet(num_kpts=17, C=8, num_deconv_resid_blocks=1, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return model, dict(variables)


@pytest.fixture(scope="module")
def raw_image():
    return np.random.RandomState(11).randint(0, 256, (140, 170, 3), np.uint8)


def _pair(kpts_model, **kw):
    model, variables = kpts_model
    plain = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5, **kw
    )
    comp = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5,
        compact_inputs=True, **kw
    )
    return plain, comp


def test_compact_inference_exact_parity(kpts_model, raw_image):
    """pad_multiple=64 (the exact path): device normalize of the uint8 input
    reproduces the host fp32 pipeline — heatmaps to fp rounding, identical
    detections."""
    plain, comp = _pair(kpts_model)
    r_p = plain(raw_image)
    r_c = comp(raw_image)
    np.testing.assert_allclose(r_c.kpts_heatmaps, r_p.kpts_heatmaps, atol=2e-5)
    np.testing.assert_array_equal(r_c.kpts_coords, r_p.kpts_coords)
    np.testing.assert_allclose(r_c.obj_scores, r_p.obj_scores, atol=1e-5)
    # the displayed input is the uint8 crop itself (no inverse-normalize)
    assert r_c.model_input_image.dtype == np.uint8


def test_compact_inference_flip_parity(kpts_model, raw_image):
    plain, comp = _pair(kpts_model, use_flip=True)
    r_p = plain(raw_image)
    r_c = comp(raw_image)
    np.testing.assert_allclose(r_c.kpts_heatmaps, r_p.kpts_heatmaps, atol=2e-5)
    np.testing.assert_array_equal(r_c.kpts_coords, r_p.kpts_coords)


def test_compact_prepare_input_bucket_pad(kpts_model, raw_image):
    """pad>64 bucketing in the uint8 path: dtype stays uint8, the pad region
    is the nearest-uint8-to-normalized-zero pixel, and decode still runs."""
    from human_pose_tpu.ops.images import PAD_PIXEL_U8

    model, variables = kpts_model
    comp = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5,
        pad_multiple=256, compact_inputs=True,
    )
    x, _, _ = comp.prepare_input(raw_image)
    assert x.dtype == np.uint8
    assert x.shape[1] % 256 == 0 and x.shape[2] % 256 == 0
    np.testing.assert_array_equal(x[0, -1, -1], np.asarray(PAD_PIXEL_U8, np.uint8))
    r = comp(raw_image)
    assert r.kpts_coords.shape[1:] == (17, 2)


def test_compact_pipeline_parallel_parity(kpts_model, raw_image):
    """compact_inputs + pipeline_devices: the pre-pipeline jitted normalize
    (models._prep_images_jit) must reproduce the monolithic compact path."""
    model, variables = kpts_model
    mono = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5, compact_inputs=True
    )
    piped = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5, compact_inputs=True,
        pipeline_devices=2,
    )
    r_m = mono(raw_image)
    r_p = piped(raw_image)
    np.testing.assert_allclose(r_p.kpts_heatmaps, r_m.kpts_heatmaps, atol=2e-5)
    np.testing.assert_array_equal(r_p.kpts_coords, r_m.kpts_coords)


def test_compact_rejects_float_images(kpts_model):
    """compact_inputs must fail loud on float inputs — the device prep only
    normalizes integer dtypes, so floats would silently skip normalization."""
    model, variables = kpts_model
    comp = InferenceKeypointsModel(
        model, variables, input_size=128, max_num_people=5, compact_inputs=True
    )
    float_img = np.random.RandomState(1).rand(100, 120, 3).astype(np.float32)
    with pytest.raises(ValueError, match="uint8"):
        comp(float_img)

    from human_pose_tpu.data.transforms import ClassificationTransform

    t = ClassificationTransform(out_size=32, normalize=False)
    with pytest.raises(ValueError, match="uint8"):
        t.inference(float_img)


def test_sppe_compact_inference_parity(raw_image):
    """uint8-to-device SPPE inference == host-normalized path (argmax decode
    is tie-free on a continuous heatmap, so coords are identical)."""
    from human_pose_tpu.inference.models import InferenceSPPEModel
    from human_pose_tpu.models import HRNetSPPE

    model = HRNetSPPE(num_keypoints=17, C=8, **TINY)
    variables = dict(
        model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    plain = InferenceSPPEModel(model, variables, input_size=64)
    comp = InferenceSPPEModel(model, variables, input_size=64, compact_inputs=True)
    r_p = plain(raw_image)
    r_c = comp(raw_image)
    np.testing.assert_allclose(r_c.kpts_heatmaps, r_p.kpts_heatmaps, atol=2e-5)
    np.testing.assert_array_equal(r_c.kpts_coords, r_p.kpts_coords)
    assert r_c.model_input_image.dtype == np.uint8


def test_classification_compact_inference_parity():
    """uint8-to-device classification inference == host-normalized path."""
    from human_pose_tpu.inference import InferenceClassificationModel
    from human_pose_tpu.models import ClassificationHRNet

    model = ClassificationHRNet(C=8, num_classes=5, **TINY)
    variables = dict(
        model.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), train=False)
    )
    plain = InferenceClassificationModel(model, variables, input_size=32)
    comp = InferenceClassificationModel(
        model, variables, input_size=32, compact_inputs=True
    )
    img = np.random.RandomState(5).randint(0, 256, (60, 70, 3), np.uint8)
    r_p = plain(img)
    r_c = comp(img)
    assert r_c.image.dtype == np.uint8
    np.testing.assert_allclose(r_c.probs, r_p.probs, atol=1e-6)


def test_compact_eval_matches_plain_and_batched(kpts_model, tmp_path):
    """Through the full eval pipeline: serial(compact) == serial(plain)
    (device normalize == host normalize end-to-end), and batched(compact) ==
    serial(compact) (the uint8 path through the bucket machinery)."""
    from human_pose_tpu.bin.eval_keypoints import evaluate_dataset
    from human_pose_tpu.data import CocoKeypointsDataset, prebake_annotations
    from human_pose_tpu.inference.batched_eval import evaluate_dataset_batched
    from tests.test_batched_eval import assert_detections_match
    from tests.test_data import make_coco_fixture

    root = tmp_path / "coco"
    make_coco_fixture(root, n_images=3, size=96)
    prebake_annotations(str(root), "val2017")
    ds = CocoKeypointsDataset(str(root), "val2017", None, out_size=96)

    model, variables = kpts_model
    plain = InferenceKeypointsModel(
        model, variables, input_size=96, max_num_people=5
    )
    comp = InferenceKeypointsModel(
        model, variables, input_size=96, max_num_people=5, compact_inputs=True
    )
    serial_plain = evaluate_dataset(plain, ds)
    serial_comp = evaluate_dataset(comp, ds)
    assert_detections_match(serial_plain, serial_comp)
    batched_comp = evaluate_dataset_batched(comp, ds, batch_size=2, progress=False)
    assert_detections_match(serial_comp, batched_comp)

"""Batched eval parity: the shape-bucketed batched evaluator
(inference/batched_eval.py) must produce the serial per-image pipeline's
detections — across mixed image shapes (bucketing), partial batches
(padding), flip TTA, pad_multiple bucketing (dynamic per-image valid mask),
and a sharded data mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.bin.eval_keypoints import evaluate_dataset
from human_pose_tpu.data import CocoKeypointsDataset, prebake_annotations
from human_pose_tpu.inference import (
    InferenceKeypointsModel,
    evaluate_dataset_batched,
)
from tests.test_data import make_coco_fixture

TINY = dict(num_blocks_per_stage=(1, 1, 1, 1), num_units=1)


@pytest.fixture(scope="module")
def kpts_model():
    from human_pose_tpu.models import HigherHRNet

    model = HigherHRNet(num_kpts=17, C=8, num_deconv_resid_blocks=1, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return model, dict(variables)


@pytest.fixture(scope="module")
def mixed_ds(tmp_path_factory):
    """5 images in 2 shape buckets (square and 1:2) -> partial batches in
    both buckets at batch_size 2."""
    root = tmp_path_factory.mktemp("coco_mixed")
    make_coco_fixture(root, n_images=5, sizes=[96, 96, (96, 192), (96, 192), 96])
    prebake_annotations(str(root), "val2017")
    return CocoKeypointsDataset(str(root), "val2017", transform=None)


def _by_image(dets):
    out = {}
    for d in dets:
        out.setdefault(d["image_id"], []).append(d)
    return out


def assert_detections_match(serial, batched, coord_tol=0.5):
    s, b = _by_image(serial), _by_image(batched)
    assert set(s) == set(b)
    for image_id in s:
        sd, bd = s[image_id], b[image_id]
        assert len(sd) == len(bd), f"image {image_id}: {len(sd)} vs {len(bd)} persons"
        used = set()
        for det in sd:
            sk = np.asarray(det["keypoints"], np.float64).reshape(-1, 3)[:, :2]
            best, best_err = None, np.inf
            for j, cand in enumerate(bd):
                if j in used:
                    continue
                bk = np.asarray(cand["keypoints"], np.float64).reshape(-1, 3)[:, :2]
                err = np.abs(sk - bk).max()
                if err < best_err:
                    best, best_err = j, err
            assert best_err < coord_tol, f"image {image_id}: max coord err {best_err}"
            assert abs(det["score"] - bd[best]["score"]) < 1e-3
            used.add(best)


def test_batched_matches_serial_mixed_shapes(kpts_model, mixed_ds):
    model, variables = kpts_model
    im = InferenceKeypointsModel(
        model, variables, input_size=64, max_num_people=5, use_flip=True
    )
    serial = evaluate_dataset(im, mixed_ds)
    batched = evaluate_dataset_batched(im, mixed_ds, batch_size=2, progress=False)
    assert_detections_match(serial, batched)


def test_batched_pad_multiple_dynamic_mask(kpts_model, mixed_ds):
    """pad_multiple > 64 puts both image shapes in ONE padded bucket; the
    per-image dynamic valid mask must reproduce the serial path's static
    per-shape masking exactly."""
    model, variables = kpts_model
    im = InferenceKeypointsModel(
        model, variables, input_size=64, max_num_people=5, pad_multiple=128
    )
    serial = evaluate_dataset(im, mixed_ds)
    batched = evaluate_dataset_batched(im, mixed_ds, batch_size=4, progress=False)
    assert_detections_match(serial, batched)
    # both shapes really did share one compile bucket
    from human_pose_tpu.inference.batched_eval import BatchedKeypointsEvaluator

    ev = BatchedKeypointsEvaluator(im, batch_size=4)
    keys = {ev._bucket_key(mixed_ds.load_image(i).shape[:2]) for i in range(4)}
    assert len(keys) == 1


def test_batched_multiscale(kpts_model, mixed_ds):
    """Multi-scale TTA: bucket key spans every scale's compile shape."""
    model, variables = kpts_model
    im = InferenceKeypointsModel(
        model, variables, input_size=64, max_num_people=5, scales=(0.5, 1.0)
    )
    serial = evaluate_dataset(im, mixed_ds, limit=3)
    batched = evaluate_dataset_batched(
        im, mixed_ds, batch_size=2, limit=3, progress=False
    )
    assert_detections_match(serial, batched)


def test_batched_sharded_mesh(kpts_model, mixed_ds):
    """Eval batches sharded over the 8-device CPU mesh produce the serial
    detections (the reference has no distributed eval at all)."""
    from human_pose_tpu.parallel.mesh import make_mesh

    model, variables = kpts_model
    im = InferenceKeypointsModel(model, variables, input_size=64, max_num_people=5)
    serial = evaluate_dataset(im, mixed_ds)
    mesh = make_mesh(8)
    batched = evaluate_dataset_batched(
        im, mixed_ds, batch_size=8, mesh=mesh, progress=False
    )
    assert_detections_match(serial, batched)


def test_scales_without_1_rejected(kpts_model):
    """Same contract as the serial path: the scale-1 pass provides tags and
    decode geometry — its absence is a clean error at construction."""
    from human_pose_tpu.inference.batched_eval import BatchedKeypointsEvaluator

    model, variables = kpts_model
    im = InferenceKeypointsModel(
        model, variables, input_size=64, scales=(0.5, 2.0)
    )
    with pytest.raises(ValueError, match="must include 1.0"):
        BatchedKeypointsEvaluator(im, batch_size=2)


def test_mesh_mode_does_not_mutate_model_variables(kpts_model):
    """The mesh replication is evaluator-local: the injected model keeps its
    original variables (a later serial call or a second evaluator on a
    different mesh must not see mesh-committed arrays)."""
    from human_pose_tpu.inference.batched_eval import BatchedKeypointsEvaluator
    from human_pose_tpu.parallel.mesh import make_mesh

    model, variables = kpts_model
    im = InferenceKeypointsModel(model, variables, input_size=64)
    before = im.variables
    ev = BatchedKeypointsEvaluator(im, batch_size=8, mesh=make_mesh(8))
    assert im.variables is before
    assert ev._variables is not before


def test_batch_size_not_divisible_by_mesh_raises(kpts_model):
    from human_pose_tpu.inference.batched_eval import BatchedKeypointsEvaluator
    from human_pose_tpu.parallel.mesh import make_mesh

    model, variables = kpts_model
    im = InferenceKeypointsModel(model, variables, input_size=64)
    with pytest.raises(ValueError, match="not divisible"):
        BatchedKeypointsEvaluator(im, batch_size=3, mesh=make_mesh(8))


def test_max_pending_flushes_fullest_bucket(kpts_model, mixed_ds):
    """The pending-images cap flushes early (padded partial batch) instead of
    buffering unboundedly across shape buckets."""
    from human_pose_tpu.inference.batched_eval import BatchedKeypointsEvaluator

    model, variables = kpts_model
    im = InferenceKeypointsModel(model, variables, input_size=64, max_num_people=5)
    ev = BatchedKeypointsEvaluator(im, batch_size=4, max_pending=2)
    for i in range(3):
        ev.add(mixed_ds.load_image(i), image_id=i, annot=None)
        assert sum(len(v) for v in ev._buckets.values()) <= 2
    dets, _ = ev.finish()
    assert {d["image_id"] for d in dets} <= {0, 1, 2}
    assert ev._n_images == 3

"""Compact host batches (dataloader.compact_batches): uint8 images are
normalized on device, heatmap targets travel fp16, masks travel bool — and
training is numerically equivalent to the fp32 host pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.configs.keypoints import KeypointsConfig
from human_pose_tpu.data import (
    CocoKeypointsDataset,
    KeypointsTransform,
    collate,
    inverse_normalize,
    normalize,
    prebake_annotations,
)
from human_pose_tpu.train.steps import _prep_images, keypoints_train_step_body
from tests.test_data import make_coco_fixture
from tests.test_train_steps import TINY, make_kpts_batch

from human_pose_tpu.models import HigherHRNet
from human_pose_tpu.train import TrainState, create_optimizer

import jax


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_compact")
    make_coco_fixture(root, n_images=3, size=96)
    prebake_annotations(str(root), "val2017")
    return root


def test_prep_images_matches_host_normalize():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (2, 16, 16, 3), np.uint8)
    host = normalize(img)  # fp32 host path (data/transforms.py)
    dev = np.asarray(_prep_images(jnp.asarray(img)))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_prep_images_float_passthrough():
    x = jnp.ones((1, 4, 4, 3), jnp.float32) * 0.3
    assert _prep_images(x) is x


def test_inverse_normalize_uint8_passthrough():
    img = np.full((4, 4, 3), 7, np.uint8)
    assert inverse_normalize(img) is img


def _dataset(root, compact: bool):
    t = KeypointsTransform(
        out_size=96, hm_resolutions=(0.25, 0.5), normalize=not compact
    )
    return CocoKeypointsDataset(
        str(root), "val2017", t.train, out_size=96,
        hm_resolutions=[0.25, 0.5], num_kpts=17, max_num_people=10,
        compact=compact,
    )


def test_compact_dataset_equivalent_sample(coco_root):
    """Same rng -> the compact sample is the plain sample, re-encoded:
    normalize(uint8 image) == fp32 image exactly, fp16 targets within fp16
    resolution, bool masks exact (the affine warp binarizes them)."""
    plain = _dataset(coco_root, compact=False)
    comp = _dataset(coco_root, compact=True)
    for idx in range(3):
        img_p, hms_p, masks_p, joints_p = plain.__getitem__(
            idx, np.random.default_rng((5, idx))
        )
        img_c, hms_c, masks_c, joints_c = comp.__getitem__(
            idx, np.random.default_rng((5, idx))
        )
        assert img_c.dtype == np.uint8
        np.testing.assert_allclose(normalize(img_c), img_p, atol=1e-6)
        for h_c, h_p in zip(hms_c, hms_p):
            assert h_c.dtype == np.float16
            np.testing.assert_allclose(h_c.astype(np.float32), h_p, atol=5e-4)
        for m_c, m_p in zip(masks_c, masks_p):
            assert m_c.dtype == np.bool_
            np.testing.assert_array_equal(m_c.astype(np.float32), m_p)
        np.testing.assert_array_equal(joints_c, joints_p)

    batch = collate([comp.__getitem__(i, np.random.default_rng((5, i))) for i in range(2)])
    assert batch["images"].dtype == np.uint8
    assert batch["heatmaps"][0].dtype == np.float16
    assert batch["masks"][1].dtype == np.bool_


def _make_state(rng):
    model = HigherHRNet(num_kpts=17, C=8, num_deconv_resid_blocks=1, **TINY)
    variables = model.init(rng, jnp.zeros((2, 64, 64, 3)), train=False)
    tx = create_optimizer("Adam", lr=1e-3)
    return TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )


def test_compact_train_step_loss_parity():
    """One unjitted train step on the same underlying batch, compact vs
    plain: loss/grad-driven params agree to fp16-target resolution."""
    rng_np = np.random.RandomState(3)
    plain = make_kpts_batch(rng_np, n=2, size=64)
    # re-encode the SAME batch compactly: the fp32 images of make_kpts_batch
    # are uniform [0,1) — treat them as uint8/255 so both paths see the same
    # pixels after normalization
    u8 = (np.asarray(plain["images"]) * 255).astype(np.uint8)
    plain["images"] = jnp.asarray(normalize(u8))
    compact = {
        "images": jnp.asarray(u8),
        "heatmaps": [h.astype(jnp.float16) for h in plain["heatmaps"]],
        "masks": [m.astype(bool) for m in plain["masks"]],
        "joints": plain["joints"],
    }
    state = _make_state(jax.random.PRNGKey(4))
    s_p, m_p = keypoints_train_step_body(state, plain, 1e-3)
    s_c, m_c = keypoints_train_step_body(state, compact, 1e-3)
    assert abs(float(m_p["loss"]) - float(m_c["loss"])) < 2e-3
    for a, b in zip(
        jax.tree_util.tree_leaves(s_p.params), jax.tree_util.tree_leaves(s_c.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_config_wires_compact_batches(coco_root):
    cfg = KeypointsConfig.from_dict(
        {
            "setup": {"experiment_name": "t", "seed": 0},
            "dataloader": {
                "batch_size": 2,
                "num_workers": 0,
                "compact_batches": True,
                "train_ds": {"root": str(coco_root), "split": "val2017",
                             "out_size": 96},
                "val_ds": {"root": str(coco_root), "split": "val2017",
                           "out_size": 96},
            },
            "transform": {"out_size": 96},
            "trainer": {"accelerator": "cpu"},
        }
    )
    dm = cfg.create_datamodule()
    batch = next(iter(dm.train_dl))
    assert batch["images"].dtype == np.uint8
    assert batch["heatmaps"][0].dtype == np.float16
    assert batch["masks"][0].dtype == np.bool_


def test_classification_transform_compact():
    from human_pose_tpu.data.transforms import ClassificationTransform

    rng_img = np.random.RandomState(1)
    img = rng_img.randint(0, 256, (120, 100, 3), np.uint8)
    plain = ClassificationTransform(out_size=32)
    comp = ClassificationTransform(out_size=32, normalize=False)
    for method in ("train", "inference"):
        a = getattr(plain, method)(img, np.random.default_rng(9))
        b = getattr(comp, method)(img, np.random.default_rng(9))
        assert b.dtype == np.uint8
        np.testing.assert_allclose(normalize(b), a, atol=1e-6)


def test_classification_val_step_uint8_matches_float():
    from tests.test_train_steps import make_cls_state
    from human_pose_tpu.train import classification_val_step

    state = make_cls_state(jax.random.PRNGKey(7))
    u8 = np.random.RandomState(2).randint(0, 256, (4, 32, 32, 3), np.uint8)
    labels = jnp.arange(4) % 13
    m_u8, logits_u8 = classification_val_step(state, jnp.asarray(u8), labels)
    m_f, logits_f = classification_val_step(state, jnp.asarray(normalize(u8)), labels)
    np.testing.assert_allclose(
        np.asarray(logits_u8), np.asarray(logits_f), atol=1e-5
    )


def test_compact_batch_data_parallel_matches_single_device():
    """uint8/fp16/bool batches shard over the 8-device mesh like fp32 ones:
    global-mean metrics match the single-device compact step."""
    from human_pose_tpu.parallel import make_mesh, replicate, shard_batch
    from human_pose_tpu.train.steps import keypoints_train_step_body

    assert jax.device_count() >= 8
    rng_np = np.random.RandomState(7)
    plain = make_kpts_batch(rng_np, n=8, size=64)
    compact = {
        "images": jnp.asarray(
            (np.asarray(plain["images"]) * 255).astype(np.uint8)
        ),
        "heatmaps": [h.astype(jnp.float16) for h in plain["heatmaps"]],
        "masks": [m.astype(bool) for m in plain["masks"]],
        "joints": plain["joints"],
    }
    state = _make_state(jax.random.PRNGKey(8))
    _, m1 = keypoints_train_step_body(state, compact, 1e-3)

    mesh = make_mesh(8)
    state8 = replicate(mesh, _make_state(jax.random.PRNGKey(8)))
    sharded = jax.tree_util.tree_map(lambda x: shard_batch(mesh, x), compact)
    _, m8 = keypoints_train_step_body(state8, sharded, 1e-3)
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4


def test_classification_config_wires_compact(tmp_path):
    from human_pose_tpu.configs.classification import ClassificationConfig
    from tests.test_data import make_imagenet_fixture

    root = tmp_path / "imagenet"
    make_imagenet_fixture(root, split="train")
    make_imagenet_fixture(root, split="val")
    cfg = ClassificationConfig.from_dict(
        {
            "setup": {"experiment_name": "t", "seed": 0},
            "dataloader": {
                "batch_size": 2,
                "num_workers": 0,
                "compact_batches": True,
                "train_ds": {"root": str(root), "split": "train"},
                "val_ds": {"root": str(root), "split": "val"},
            },
            "transform": {"out_size": 32},
            "trainer": {"accelerator": "cpu"},
        }
    )
    dm = cfg.create_datamodule()
    batch = next(iter(dm.train_dl))
    assert batch["images"].dtype == np.uint8
    assert batch["labels"].dtype == np.int32


def test_config_rejects_custom_mean_with_compact(coco_root):
    cfg = KeypointsConfig.from_dict(
        {
            "setup": {"experiment_name": "t", "seed": 0},
            "dataloader": {"compact_batches": True,
                           "train_ds": {"root": str(coco_root), "split": "val2017"},
                           "val_ds": {"root": str(coco_root), "split": "val2017"}},
            "transform": {"out_size": 96, "mean": [0.5, 0.5, 0.5]},
            "trainer": {"accelerator": "cpu"},
        }
    )
    with pytest.raises(ValueError, match="compact_batches"):
        cfg.create_datamodule()

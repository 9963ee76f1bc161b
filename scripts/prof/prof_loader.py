"""Host input-pipeline profiler: can the data loader feed the chip?

SURVEY §7 "hard parts" #4: Gaussian splatting + warpAffine for bs48 @512
must not starve the TPU (training consumes 125.1 img/s/chip at the measured
optimum, bin/bench_train.py). This measures, on a synthetic COCO train split
at the production shape (512 input, hm scales 0.25/0.5, sigma 2):

1. per-stage single-thread cost of one training sample:
   imread | affine+flip+normalize transform | target gen (C++ splat) | collate
2. end-to-end DataLoader throughput at num_workers in {1, 2, 4}
3. cores needed to feed one chip = 125.1 / (per-core img/s)

This box has ONE CPU core, so the absolute numbers are per-core figures; the
thread-pool loader scales with cores on a real TPU VM host (cv2/numpy release
the GIL for the heavy ops; v5e-8 hosts have 112 vCPUs at 8 chips -> 14
vCPUs/chip of budget).

Usage: python prof_loader.py [--n=64] [--batch=8] [--no-e2e] [--compact]

NOTE: this 1-core box is noisy (stage costs jitter ±30% between runs); for
plain-vs-compact comparisons run the two datasets interleaved on the same
samples (see docs/performance.md for the measured A/B).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[2]))
sys.path.insert(0, str(Path(__file__).parents[2] / "scripts"))

from make_synthetic_coco import make_split  # noqa: E402

from human_pose_tpu.data import (  # noqa: E402
    CocoKeypointsDataset,
    DataLoader,
    KeypointsTransform,
    collate,
    prebake_annotations,
)


def timeit(fn, iters: int, *args):
    fn(*args)  # warm caches
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    return (time.perf_counter() - t0) / iters, out


def main() -> None:
    n_images, batch, e2e, compact = 64, 8, True, False
    for tok in sys.argv[1:]:
        if tok.startswith("--n="):
            n_images = int(tok.split("=")[1])
        elif tok.startswith("--batch="):
            batch = int(tok.split("=")[1])
        elif tok == "--no-e2e":
            e2e = False
        elif tok == "--compact":
            compact = True
        else:
            raise SystemExit(f"unknown flag: {tok}")

    # cache key includes n; a marker file written only after the prebake
    # completes prevents latching a partially-built split
    root = Path(f"/tmp/prof_loader_coco_n{n_images}")
    marker = root / ".complete"
    if not marker.exists():
        make_split(root, "train2017", n_images, size=512, seed=0)
        prebake_annotations(str(root), "train2017")
        marker.touch()

    t = KeypointsTransform(
        out_size=512, hm_resolutions=(0.25, 0.5),
        max_rotation=30, min_scale=0.7, max_scale=1.6, max_translate=40,
        normalize=not compact,
    )
    ds = CocoKeypointsDataset(
        str(root), "train2017", t.train, out_size=512,
        hm_resolutions=[0.25, 0.5], num_kpts=17, max_num_people=30, sigma=2.0,
        compact=compact,
    )

    # -- per-stage single-thread breakdown (sample 0, fixed rng) -------------
    iters = 20
    rng = lambda: np.random.default_rng((0, 0, 0))  # noqa: E731

    dt_read, (img, annot, mask) = timeit(lambda: ds.get_raw_data(0), iters)

    from human_pose_tpu.data.coco import get_coco_joints

    annots = [o for o in annot if o.get("iscrowd", 0) == 0 or o.get("num_keypoints", 0) > 0]
    joints = get_coco_joints(annots)

    def transform_stage():
        ml = [mask.astype(np.float32).copy() for _ in range(2)]
        jl = [joints.copy() for _ in range(2)]
        return t.train(img, ml, jl, rng())

    dt_tf, (timg, mask_list, joints_list) = timeit(transform_stage, iters)

    def target_stage():
        out = []
        for i in range(2):
            pj = ds.joints_generators[i](joints_list[i])
            out.append(ds.hm_generators[i](pj[pj.sum(axis=(1, 2)) > 0]))
        return out

    dt_tg, _ = timeit(target_stage, iters)

    def full_sample(i=0):
        return ds.__getitem__(i, np.random.default_rng((0, 0, i)))

    dt_full, sample = timeit(full_sample, iters)
    dt_col, _ = timeit(lambda: collate([sample] * batch), 5)

    print(f"# per-sample stage costs (ms, single thread, bs{batch} collate amortized):")
    print(
        f"#   imread+mask {dt_read*1e3:.1f} | transform {dt_tf*1e3:.1f} | "
        f"targets {dt_tg*1e3:.1f} | full __getitem__ {dt_full*1e3:.1f} | "
        f"collate/img {dt_col/batch*1e3:.2f}"
    )
    per_img_ms = dt_full * 1e3 + dt_col / batch * 1e3
    core_rate = 1e3 / per_img_ms

    results = {"per_image_ms_1thread": round(per_img_ms, 2),
               "imgs_per_sec_per_core": round(core_rate, 1)}

    # -- end-to-end loader throughput ----------------------------------------
    if e2e:
        for nw in (1, 2, 4):
            dl = DataLoader(
                ds, batch_size=batch, collate_fn=collate, shuffle=True,
                num_workers=nw, seed=0,
            )
            nb = 0
            t0 = time.perf_counter()
            for _ in dl:
                nb += 1
            dt = time.perf_counter() - t0
            rate = nb * batch / dt
            results[f"loader_imgs_per_sec_nw{nw}"] = round(rate, 1)
            print(f"# loader end-to-end num_workers={nw}: {rate:.1f} img/s")

    train_rate = 125.1  # bin/bench_train.py bs48 @512 single-chip optimum
    results["cores_to_feed_one_chip"] = round(train_rate / core_rate, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

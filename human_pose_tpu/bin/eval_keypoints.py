"""COCO val2017 keypoint evaluation CLI.

Counterpart of reference src/keypoints/bin/eval.py: builds the inference
model, runs the whole val split, writes ``val2017_results.json`` +
``config.yaml`` + ``coco_output.txt`` (the AP table) into
``evaluation_results/<timestamp>/``.

Usage:
    python -m human_pose_tpu.bin.eval_keypoints \
        --config=experiments/keypoints/higher_hrnet_32.yaml \
        --inference.ckpt_path=... [--inference.use_flip=True] \
        [--inference.scales=[0.5,1,2]] [--limit=N] \
        [--batch_size=N] [--sharded=true]

``--batch_size`` > 1 switches to the batched evaluator
(inference/batched_eval.py): shape-bucketed whole-batch forward + decode with
only the decoded joints fetched to host — same detections, much higher
throughput than the reference's strictly per-image loop. ``--sharded=true``
additionally shards eval batches over a data mesh of all local devices.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
from tqdm.auto import tqdm

from ..configs.keypoints import KeypointsConfig
from ..data.coco import CocoKeypointsDataset
from ..inference.batched_eval import image_id_from_path
from ..loggers.pylogger import log
from ..metrics.cocoeval import COCOKeypointsEval
from ..utils.files import load_json, save_json, save_yaml


def evaluate_dataset(model, ds: CocoKeypointsDataset, limit: int = -1) -> list[dict]:
    results = []
    oks_values = []
    n = len(ds) if limit <= 0 else min(limit, len(ds))
    pbar = tqdm(range(n), desc="evaluating val2017")
    for idx in pbar:
        image = ds.load_image(idx)
        annot = ds.load_annot(idx)
        result = model(image, annot=annot)
        # per-image OKS like the reference (results.py:300-304)
        try:
            oks = result.calculate_OKS()
        except Exception:
            oks = -1.0
        if oks >= 0:
            oks_values.append(oks)
            pbar.set_postfix({"OKS": f"{oks:.2f}", "mean": f"{np.mean(oks_values):.3f}"})
        image_id = image_id_from_path(ds.images_filepaths[idx], fallback=idx)
        results.extend(result.to_coco_detections(image_id))
    if oks_values:
        log.info(f"mean image OKS over {len(oks_values)} images: {np.mean(oks_values):.4f}")
    return results


def main() -> None:
    argv = sys.argv[1:]
    cfg_path = "experiments/keypoints/higher_hrnet_32.yaml"
    limit = -1
    batch_size = 1
    sharded = False
    for tok in argv:
        if tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
        if tok.startswith("--limit="):
            limit = int(tok.split("=", 1)[1])
        if tok.startswith("--batch_size="):
            batch_size = int(tok.split("=", 1)[1])
        if tok.startswith("--sharded="):
            sharded = tok.split("=", 1)[1].lower() in ("1", "true", "yes")
    cfg_dict = KeypointsConfig.from_yaml_to_dict(cfg_path, argv)
    cfg_dict.setdefault("setup", {})["is_train"] = False
    cfg = KeypointsConfig.from_dict(cfg_dict)

    model = cfg.create_inference_model()
    ds = CocoKeypointsDataset(
        cfg.dataloader.val_ds.root, cfg.dataloader.val_ds.split, transform=None
    )
    out_dir = Path("evaluation_results") / time.strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)

    if sharded and batch_size <= 1:
        raise SystemExit(
            "--sharded=true requires --batch_size>1 (a multiple of the device "
            "count): distributed eval shards whole batches over the mesh"
        )
    if batch_size > 1:
        from ..inference.batched_eval import evaluate_dataset_batched

        mesh = None
        if sharded:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh()
        detections = evaluate_dataset_batched(
            model, ds, batch_size=batch_size, limit=limit, mesh=mesh
        )
    else:
        detections = evaluate_dataset(model, ds, limit)
    save_json(detections, out_dir / "val2017_results.json")
    save_yaml(cfg.to_dict(), out_dir / "config.yaml")

    gt_path = Path(cfg.dataloader.val_ds.root) / "annotations" / (
        f"person_keypoints_{cfg.dataloader.val_ds.split}.json"
    )
    gt = load_json(gt_path)
    evaluator = COCOKeypointsEval(gt, detections)
    evaluator.evaluate()
    summary = evaluator.summarize()
    (out_dir / "coco_output.txt").write_text(summary)
    log.info("\n" + summary)
    print(summary)


if __name__ == "__main__":
    main()

"""COCO val2017 keypoint evaluation CLI.

Counterpart of reference src/keypoints/bin/eval.py: builds the inference
model, runs the whole val split, writes ``val2017_results.json`` +
``config.yaml`` + ``coco_output.txt`` (the AP table) into
``evaluation_results/<timestamp>/``.

Usage:
    python -m human_pose_tpu.bin.eval_keypoints \
        --config=experiments/keypoints/higher_hrnet_32.yaml \
        --inference.ckpt_path=... [--inference.use_flip=True] [--limit=N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

from tqdm.auto import tqdm

from ..configs.keypoints import KeypointsConfig
from ..data.coco import CocoKeypointsDataset
from ..loggers.pylogger import log
from ..metrics.cocoeval import COCOKeypointsEval
from ..utils.files import load_json, save_json, save_yaml


def evaluate_dataset(model, ds: CocoKeypointsDataset, limit: int = -1) -> list[dict]:
    results = []
    n = len(ds) if limit <= 0 else min(limit, len(ds))
    for idx in tqdm(range(n), desc="evaluating val2017"):
        image = ds.load_image(idx)
        annot = ds.load_annot(idx)
        result = model(image, annot=None)
        image_id = int(Path(ds.images_filepaths[idx]).stem)
        results.extend(result.to_coco_detections(image_id))
        del annot
    return results


def main() -> None:
    argv = sys.argv[1:]
    cfg_path = "experiments/keypoints/higher_hrnet_32.yaml"
    limit = -1
    for tok in argv:
        if tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
        if tok.startswith("--limit="):
            limit = int(tok.split("=", 1)[1])
    cfg_dict = KeypointsConfig.from_yaml_to_dict(cfg_path, argv)
    cfg_dict.setdefault("setup", {})["is_train"] = False
    cfg = KeypointsConfig.from_dict(cfg_dict)

    model = cfg.create_inference_model()
    ds = CocoKeypointsDataset(
        cfg.dataloader.val_ds.root, cfg.dataloader.val_ds.split, transform=None
    )
    out_dir = Path("evaluation_results") / time.strftime("%Y-%m-%d_%H-%M-%S")
    out_dir.mkdir(parents=True, exist_ok=True)

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

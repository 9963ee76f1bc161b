"""ImageNet evaluation CLI.

The reference's src/classification/bin/eval.py is an empty stub; this one
actually evaluates top-1/top-5 error on the val split."""

from __future__ import annotations

import sys

import numpy as np
from tqdm.auto import tqdm

from ..configs.classification import ClassificationConfig
from ..loggers.pylogger import log


def main() -> None:
    argv = sys.argv[1:]
    cfg_path = "experiments/classification/hrnet_32.yaml"
    limit = -1
    for tok in argv:
        if tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
        if tok.startswith("--limit="):
            limit = int(tok.split("=", 1)[1])
    cfg_dict = ClassificationConfig.from_yaml_to_dict(cfg_path, argv)
    cfg_dict.setdefault("setup", {})["is_train"] = False
    cfg = ClassificationConfig.from_dict(cfg_dict)
    dm = cfg.create_datamodule()
    model = cfg.create_inference_model()

    top1_err, top5_err, n = 0, 0, 0
    ds = dm.val_ds
    total = len(ds) if limit <= 0 else min(limit, len(ds))
    for idx in tqdm(range(total), desc="ImageNet val"):
        img = ds.load_image(idx)
        label = ds.samples[idx][1]
        result = model(img)
        top5 = np.argsort(-result.probs)[:5]
        top1_err += int(top5[0] != label)
        top5_err += int(label not in top5)
        n += 1
    log.info(f"top-1 error: {top1_err / n:.4f}, top-5 error: {top5_err / n:.4f} ({n} images)")
    print({"top1_error": top1_err / n, "top5_error": top5_err / n, "n": n})


if __name__ == "__main__":
    main()

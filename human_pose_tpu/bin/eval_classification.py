"""ImageNet evaluation CLI.

The reference's src/classification/bin/eval.py is an empty stub; this one
actually evaluates top-1/top-5 error on the val split.

``--batch_size=N`` batches the center-crop inference into one jitted call per
N images (classification inputs are shape-static, so the batched math is the
serial math and it compiles once; fp summation order may differ in the last
ulp across batch shapes). The tail batch is padded by repetition and the
padded rows dropped. ``--limit=N`` truncates the split.
"""

from __future__ import annotations

import sys

import numpy as np
from tqdm.auto import tqdm

from ..configs.classification import ClassificationConfig
from ..loggers.pylogger import log


def evaluate_split(model, ds, total: int, batch_size: int = 1) -> dict:
    """top-1/top-5 error over ``ds[:total]`` — one device call per batch."""
    top1_err, top5_err, n = 0, 0, 0
    for start in tqdm(range(0, total, batch_size), desc="ImageNet val"):
        idxs = list(range(start, min(start + batch_size, total)))
        xs = np.stack([model.transform.inference(ds.load_image(i)) for i in idxs])
        labels = np.array([ds.samples[i][1] for i in idxs])
        if len(idxs) < batch_size:  # pad the tail to keep one compile shape
            pad = batch_size - len(idxs)
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, axis=0)])
        probs = np.asarray(model._apply(model.variables, model.to_device(xs)))
        top5 = np.argsort(-probs[: len(idxs)], axis=1, kind="stable")[:, :5]
        top1_err += int((top5[:, 0] != labels).sum())
        top5_err += int((top5 != labels[:, None]).all(axis=1).sum())
        n += len(idxs)
    return {"top1_error": top1_err / n, "top5_error": top5_err / n, "n": n}


def main() -> None:
    argv = sys.argv[1:]
    cfg_path = "experiments/classification/hrnet_32.yaml"
    limit = -1
    batch_size = 1
    for tok in argv:
        if tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
        if tok.startswith("--limit="):
            limit = int(tok.split("=", 1)[1])
        if tok.startswith("--batch_size="):
            batch_size = int(tok.split("=", 1)[1])
    cfg_dict = ClassificationConfig.from_yaml_to_dict(cfg_path, argv)
    cfg_dict.setdefault("setup", {})["is_train"] = False
    cfg = ClassificationConfig.from_dict(cfg_dict)
    dm = cfg.create_datamodule()
    model = cfg.create_inference_model()

    ds = dm.val_ds
    total = len(ds) if limit <= 0 else min(limit, len(ds))
    stats = evaluate_split(model, ds, total, batch_size=batch_size)
    log.info(
        f"top-1 error: {stats['top1_error']:.4f}, "
        f"top-5 error: {stats['top5_error']:.4f} ({stats['n']} images)"
    )
    print(stats)


if __name__ == "__main__":
    main()

"""Classification inference CLI (counterpart of reference
src/classification/bin/inference.py): ``--mode val|custom --dirpath`` with
top-5 probability overlays."""

from __future__ import annotations

import sys
from pathlib import Path

import cv2

from ..configs.classification import ClassificationConfig
from ..data.imagenet import ImagenetClassificationDataset
from ..loggers.pylogger import log

IMG_EXTS = {".jpg", ".jpeg", ".png", ".JPEG", ".JPG"}


def main() -> None:
    argv = sys.argv[1:]
    cfg_path = "experiments/classification/hrnet_32.yaml"
    mode, dirpath = "val", None
    for tok in argv:
        if tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
        if tok.startswith("--mode="):
            mode = tok.split("=", 1)[1]
        if tok.startswith("--dirpath="):
            dirpath = Path(tok.split("=", 1)[1])
    cfg_dict = ClassificationConfig.from_yaml_to_dict(cfg_path, argv)
    cfg_dict.setdefault("setup", {})["is_train"] = False
    cfg = ClassificationConfig.from_dict(cfg_dict)

    labels = None
    if mode == "val":
        ds = ImagenetClassificationDataset(
            cfg.dataloader.val_ds.root, cfg.dataloader.val_ds.split
        )
        labels = [ds.idx_to_label[i] for i in range(len(ds.idx_to_label))]
        paths = [Path(p) for p, _ in ds.samples[:8]]
    else:
        assert dirpath is not None, "--mode=custom requires --dirpath"
        paths = sorted(p for p in dirpath.iterdir() if p.suffix in IMG_EXTS)

    model = cfg.create_inference_model(labels=labels)
    out_dir = Path("inference_results") / "classification"
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in paths:
        img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
        result = model(img)
        for name, plot in result.plot().items():
            cv2.imwrite(
                str(out_dir / f"{p.stem}_{name}.jpg"),
                cv2.cvtColor(plot, cv2.COLOR_RGB2BGR),
            )
        log.info(f"{p.name}: top-1 idx {int(result.probs.argmax())}")


if __name__ == "__main__":
    main()

"""Classification training CLI (counterpart of reference
src/classification/bin/train.py).

Usage:
    python -m human_pose_tpu.bin.train_classification \
        [--config experiments/classification/hrnet_32.yaml] [--a.b.c=v ...]
"""

from __future__ import annotations

import sys

from ..configs.classification import ClassificationConfig
from .train import train

DEFAULT_CFG = "experiments/classification/hrnet_32.yaml"


def main() -> None:
    argv = sys.argv[1:]
    cfg_path = DEFAULT_CFG
    for tok in argv:
        if tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
    cfg_dict = ClassificationConfig.from_yaml_to_dict(cfg_path, argv)
    train(cfg_dict, ClassificationConfig)


if __name__ == "__main__":
    main()

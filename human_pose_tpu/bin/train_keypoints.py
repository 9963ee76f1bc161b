"""Keypoints training CLI (counterpart of reference src/keypoints/bin/train.py).

Usage:
    python -m human_pose_tpu.bin.train_keypoints \
        [--config experiments/keypoints/higher_hrnet_32.yaml] [--a.b.c=v ...]
"""

from __future__ import annotations

import sys

from ..configs.keypoints import KeypointsConfig
from .train import train

DEFAULT_CFG = "experiments/keypoints/higher_hrnet_32.yaml"


def main() -> None:
    argv = sys.argv[1:]
    cfg_path = DEFAULT_CFG
    for tok in argv:
        if tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
    cfg_dict = KeypointsConfig.from_yaml_to_dict(cfg_path, argv)
    train(cfg_dict, KeypointsConfig)


if __name__ == "__main__":
    main()

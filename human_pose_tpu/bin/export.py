"""Model export CLI (counterpart of the reference's ONNX export surface,
/root/reference/src/base/model.py:66-75 — the TPU-portable artifact is
StableHLO via jax.export, plus a framework-agnostic flat-weights npz).

    python -m human_pose_tpu.bin.export --config=experiments/keypoints/higher_hrnet_32.yaml \
        [--task=keypoints|classification] [--inference.ckpt_path=...] \
        [--out=exports] [--input_size=512]

Writes <out>/<architecture>.stablehlo and <out>/<architecture>.weights.npz.
"""

from __future__ import annotations

import sys
from pathlib import Path

from ..loggers.pylogger import log
from ..utils.export import export_stablehlo, export_weights_npz


def main() -> None:
    from ..utils.argv import parse_flags

    flags, passthrough = parse_flags(
        sys.argv[1:],
        {
            "config": "experiments/keypoints/higher_hrnet_32.yaml",
            "out": "exports", "input_size": 0, "task": "",
        },
        allow_passthrough=True,  # --a.b.c=v config overrides
    )
    cfg_path, out, task = flags["config"], flags["out"], flags["task"]
    input_size = flags["input_size"] or None

    if not task:  # infer from the config path, default keypoints
        task = "classification" if "classification" in cfg_path else "keypoints"
    if task == "classification":
        from ..configs.classification import ClassificationConfig as ConfigClass
    else:
        from ..configs.keypoints import KeypointsConfig as ConfigClass

    cfg_dict = ConfigClass.from_yaml_to_dict(cfg_path, passthrough)
    cfg_dict.setdefault("setup", {})["is_train"] = False
    cfg = ConfigClass.from_dict(cfg_dict)
    infer = cfg.create_inference_model()
    model, variables = infer.model, infer.variables
    size = input_size or cfg.inference.input_size

    arch = cfg.setup.architecture or type(model).__name__
    out_dir = Path(out)
    export_stablehlo(model, variables, (size, size, 3), out_dir / f"{arch}.stablehlo")
    export_weights_npz(variables, out_dir / f"{arch}.weights.npz")
    log.info(f"export complete: {out_dir}/{arch}.(stablehlo|weights.npz)")


if __name__ == "__main__":
    main()

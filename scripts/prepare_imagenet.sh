#!/usr/bin/env bash
# Unpack an ImageNet-1k kaggle archive into ImageFolder layout
# (reference scripts/prepare_imagenet.sh). Expects imagenet-object-localization-challenge.zip
set -e
ROOT=${1:-data/ImageNet}
ZIP=${2:-imagenet-object-localization-challenge.zip}
mkdir -p "$ROOT"
unzip -q "$ZIP" -d "$ROOT/raw"
mv "$ROOT"/raw/ILSVRC/Data/CLS-LOC/train "$ROOT/train"
mv "$ROOT"/raw/ILSVRC/Data/CLS-LOC/val "$ROOT/val"
# valprep: move val images into per-wnid dirs using the solution csv
python - "$ROOT" <<'PY'
import csv, os, sys, shutil
root = sys.argv[1]
sol = os.path.join(root, "raw", "LOC_val_solution.csv")
if os.path.exists(sol):
    with open(sol) as f:
        for row in csv.DictReader(f):
            wnid = row["PredictionString"].split()[0]
            src = os.path.join(root, "val", row["ImageId"] + ".JPEG")
            dst = os.path.join(root, "val", wnid)
            os.makedirs(dst, exist_ok=True)
            if os.path.exists(src):
                shutil.move(src, dst)
PY
echo "ImageNet ready under $ROOT"

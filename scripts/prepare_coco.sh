#!/usr/bin/env bash
# Download + unpack COCO 2017 (reference scripts/prepare_coco.sh)
set -e
ROOT=${1:-data/COCO}
mkdir -p "$ROOT/images" "$ROOT/annotations"
for f in train2017 val2017; do
  [ -d "$ROOT/images/$f" ] || {
    wget -c "http://images.cocodataset.org/zips/$f.zip" -P "$ROOT"
    unzip -q "$ROOT/$f.zip" -d "$ROOT/images" && rm "$ROOT/$f.zip"
  }
done
[ -f "$ROOT/annotations/person_keypoints_val2017.json" ] || {
  wget -c "http://images.cocodataset.org/annotations/annotations_trainval2017.zip" -P "$ROOT"
  unzip -q "$ROOT/annotations_trainval2017.zip" -d "$ROOT" && rm "$ROOT/annotations_trainval2017.zip"
}
echo "COCO ready under $ROOT"

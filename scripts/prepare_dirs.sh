#!/usr/bin/env bash
# Create the data/results directory layout (reference scripts/prepare_dirs.sh)
set -e
mkdir -p data/COCO data/ImageNet results pretrained inference_results evaluation_results
echo "directories ready"

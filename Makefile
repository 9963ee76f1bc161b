# Counterpart of the reference Makefile (env/dirs/data-prep/eval targets)
.PHONY: dirs coco imagenet save_coco_annots test bench train_keypoints train_classification eval_coco native serve bench_serve

native:
	cd native && python setup.py build_ext --inplace -q && cp hp_native*.so ../human_pose_tpu/data/

dirs:
	bash scripts/prepare_dirs.sh

coco:
	bash scripts/prepare_coco.sh

imagenet:
	bash scripts/prepare_imagenet.sh

save_coco_annots:
	python scripts/save_coco_annots.py

# native is implicit: human_pose_tpu.data.native auto-builds on first import
test: native
	python -m pytest tests/ -q

# decode-critical fast subset (~3 min warm): grouping + Hungarian + metrics +
# golden param counts + driver entries + e2e decode->AP
test-critical:
	python -m pytest tests/test_grouping.py tests/test_hungarian.py \
	  tests/test_metrics.py tests/test_models.py tests/test_graft_entry.py \
	  tests/test_e2e_decode_eval.py -q

# rerun only last-run failures, serially (-n 0 disables xdist): recovers the
# documented XLA:CPU worker-segfault flake, where a crashed worker reports its
# in-flight tests as failed even though they pass standalone (CLAUDE.md)
test-refailed:
	python -m pytest tests/ -q --lf -n 0

bench:
	python bench.py

# end-to-end on one real chip: full W32 train CLI -> batched eval CLI,
# compact transfer paths on (~15-25 min, mostly XLA compiles)
tpu-smoke:
	python scripts/tpu_smoke.py

bench_train:
	python -m human_pose_tpu.bin.bench_train

bench_train_cls:
	python -m human_pose_tpu.bin.bench_train --task=classification

bench_decompose:
	python -m human_pose_tpu.bin.bench_decompose

train_keypoints:
	python -m human_pose_tpu.bin.train_keypoints --config=experiments/keypoints/higher_hrnet_32.yaml

train_classification:
	python -m human_pose_tpu.bin.train_classification --config=experiments/classification/hrnet_32.yaml

eval_coco:
	python -m human_pose_tpu.bin.eval_keypoints --config=experiments/keypoints/higher_hrnet_32.yaml

serve:
	python -m human_pose_tpu.bin.serve --config=experiments/keypoints/higher_hrnet_32.yaml

bench_serve:
	python -m human_pose_tpu.bin.bench_serve

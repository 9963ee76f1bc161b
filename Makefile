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

test:
	python -m pytest tests/ -q

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

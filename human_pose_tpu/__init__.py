"""human_pose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) human-pose framework.

A from-scratch rebuild of the capabilities of thawro/pytorch-human-pose
(reference mounted at /root/reference, see SURVEY.md):

* ``models``   — HRNet-W32 backbone, HigherHRNet pose heads, classification head,
                 Hourglass/SimpleBaseline/ResNet alternatives (flax.linen, NHWC).
* ``ops``      — jittable/Pallas compute kernels: heatmap NMS, top-k decode,
                 AE-tag grouping with an in-JAX Hungarian solver, flip-TTA merge,
                 device-side affine warping and Gaussian target generation.
* ``parallel`` — mesh construction, data-parallel sharding, collective metrics.
* ``data``     — COCO keypoints + ImageNet pipelines, host-side augmentation with
                 prefetching loaders.
* ``train``    — functional train steps, optax optimizer/scheduler factories,
                 trainer loop, callbacks, meters, checkpointing.
* ``metrics``  — OKS, a NumPy COCO keypoint AP evaluator (pycocotools-free), PCKh.
* ``inference``— classification / keypoints inference models and result plotting.
* ``bin``      — train/eval/inference CLIs mirroring the reference UX.
"""

__version__ = "0.1.0"

"""Shared normalization constants (single source of truth for the host
pipeline in data/transforms.py and the device path in ops/images.py —
reference src/base/transforms/base.py ImageNet mean/std)."""

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# uint8 pixel closest to normalized zero, per channel: what the fp32 path's
# zero-padding feeds the network, expressed in the uint8 domain
PAD_PIXEL_U8 = tuple(int(round(m * 255.0)) for m in IMAGENET_MEAN)

"""Device-side image normalization (compact uint8 transfer path).

Compact host batches / compact inference inputs ship uint8 pixels (4x less
host->device bandwidth and host memcpy than fp32) and normalize on device,
where XLA fuses the multiply-add into the first convolution. The constants
match data/transforms.normalize (the reference's ImageNet mean/std,
src/base/transforms/base.py).
"""

from __future__ import annotations

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Pad pixel for shape-bucketing zero-pad in the uint8 path: round(mean*255)
# per channel, i.e. the uint8 value closest to normalized zero (what the
# fp32 path's zero-padding feeds the network). Off by <0.01 normalized units
# per channel — the pad>64 bucket path is documented APPROXIMATE already and
# the decode masks pad-region detections.
PAD_PIXEL_U8 = (124, 116, 104)


def prep_images(images, out_dtype=None):
    """Normalize uint8 NHWC images on device; float images pass through.

    The dtype branch is static under jit (costs nothing on the float path).
    ``out_dtype`` casts the normalized result (e.g. bfloat16 for inference
    models whose host path pre-casts at transfer time).
    """
    if not jnp.issubdtype(images.dtype, jnp.integer):
        return images
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    out = (images.astype(jnp.float32) / 255.0 - mean) / std
    return out if out_dtype is None else out.astype(out_dtype)

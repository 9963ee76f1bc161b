"""Device-side image normalization (compact uint8 transfer path).

Compact host batches / compact inference inputs ship uint8 pixels (4x less
host->device bandwidth and host memcpy than fp32) and normalize on device,
where XLA fuses the multiply-add into the first convolution. The constants
match data/transforms.normalize (the reference's ImageNet mean/std,
src/base/transforms/base.py).
"""

from __future__ import annotations

import jax.numpy as jnp

# Single source of truth shared with the host pipeline (constants.py).
# PAD_PIXEL_U8 pads shape buckets in the uint8 path — off by <0.01
# normalized units per channel from the fp32 path's exact zero-padding; the
# pad>64 bucket path is documented APPROXIMATE already and the decode masks
# pad-region detections.
from ..constants import IMAGENET_MEAN, IMAGENET_STD, PAD_PIXEL_U8  # noqa: F401


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

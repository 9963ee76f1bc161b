"""ClassificationHRNet (TPU-native, flax.linen, NHWC).

Re-implements the behavior of the reference
(/root/reference/src/classification/architectures/hrnet.py:7-74): the 4-scale
HRNet backbone followed by a classification head that bottlenecks each scale to
[128, 256, 512, 1024] channels, cascades stride-2 downsample+add, maps to 2048
channels with a 1x1 conv, global-average-pools and applies a Linear classifier.
Logits are returned in float32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .hrnet import Bottleneck, HRNetBackbone
from .norm import batch_norm

Dtype = Any


class ClassificationHead(nn.Module):
    C: int
    num_classes: int = 1000
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: list, train: bool) -> jnp.ndarray:
        out_channels = [128, 256, 512, 1024]
        num_stages = len(out_channels)
        g = self.bn_groups

        out = Bottleneck(out_channels[0], bn_groups=g, dtype=self.dtype, name="incr0")(xs[0], train)
        for i in range(num_stages - 1):
            # downsample block uses a biased conv in the reference (hrnet.py:20-31)
            down = nn.Conv(
                out_channels[i + 1], (3, 3), strides=(2, 2), padding=1, use_bias=True,
                dtype=self.dtype, name=f"down{i}_conv",
            )(out)
            down = batch_norm(
                down, train=train, bn_groups=g, dtype=self.dtype, name=f"down{i}_bn"
            )
            down = nn.relu(down)
            out = Bottleneck(out_channels[i + 1], bn_groups=g, dtype=self.dtype, name=f"incr{i + 1}")(
                xs[i + 1], train
            ) + down

        out = nn.Conv(2048, (1, 1), use_bias=True, dtype=self.dtype, name="final_conv")(out)
        out = batch_norm(out, train=train, bn_groups=g, dtype=self.dtype, name="final_bn")
        out = nn.relu(out)

        flat = jnp.mean(out, axis=(1, 2))  # global average pool (NHWC)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(flat)
        return jnp.asarray(logits, jnp.float32)


class ClassificationHRNet(nn.Module):
    """HRNet-W32 + classification head (reference hrnet.py:64-74)."""

    C: int = 32
    num_classes: int = 1000
    num_blocks_per_stage: tuple = (1, 1, 4, 3)
    num_units: int = 4
    remat: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        xs = HRNetBackbone(
            self.C, final_stage_single_scale=False,
            num_blocks_per_stage=self.num_blocks_per_stage, num_units=self.num_units,
            remat=self.remat, bn_groups=self.bn_groups, dtype=self.dtype, name="backbone",
        )(images, train)
        return ClassificationHead(
            self.C, self.num_classes, bn_groups=self.bn_groups, dtype=self.dtype, name="head"
        )(xs, train)

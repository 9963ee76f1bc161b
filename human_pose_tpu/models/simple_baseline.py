"""SimpleBaseline pose network (counterpart of reference
src/keypoints/architectures/simple_baseline.py): ResNet backbone + 3 deconv
(k4 s2) + 1x1 head -> single heatmap stage at 1/4 resolution."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .norm import batch_norm
from .resnet import ResNet

Dtype = Any


class SimpleBaseline(nn.Module):
    num_kpts: int = 17
    backbone: str = "resnet50"
    deconv_features: int = 256
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = ResNet(
            self.backbone, bn_groups=self.bn_groups, dtype=self.dtype, name="backbone"
        )(images, train)
        for i in range(3):
            x = nn.ConvTranspose(
                self.deconv_features, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = batch_norm(
                x, train=train, bn_groups=self.bn_groups, dtype=self.dtype,
                name=f"deconv_bn{i}",
            )
            x = nn.relu(x)
        hms = nn.Conv(self.num_kpts, (1, 1), dtype=self.dtype, name="final")(x)
        return [jnp.asarray(hms, jnp.float32)]

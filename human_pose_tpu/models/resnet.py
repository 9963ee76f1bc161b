"""ResNet backbone family (counterpart of reference
src/base/architectures/backbones/resnet.py — a torchvision-style ResNet).

No torch.hub pretrained weights (the reference's SimpleBaseline loads
pretrained torchvision weights, src/keypoints/architectures/simple_baseline.py:17);
weights here come from scratch or checkpoint partial-load.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .hrnet import Bottleneck
from .norm import batch_norm

Dtype = Any

RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class _ResNetBlock(nn.Module):
    """Stage of residual blocks with stride-2 entry (except stage 1)."""

    block_type: str
    features: int
    num_blocks: int
    stride: int
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_blocks):
            stride = self.stride if i == 0 else 1
            if self.block_type == "bottleneck":
                x = _StridedBottleneck(self.features * 4, stride, bn_groups=self.bn_groups, dtype=self.dtype, name=f"b{i}")(x, train)
            else:
                x = _StridedBasic(self.features, stride, bn_groups=self.bn_groups, dtype=self.dtype, name=f"b{i}")(x, train)
        return x


class _StridedBottleneck(nn.Module):
    features: int
    stride: int = 1
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from .hrnet import ConvBN

        mid = self.features // 4
        g = self.bn_groups
        residual = x
        out = ConvBN(mid, 1, relu=True, bn_groups=g, dtype=self.dtype, name="cb1")(x, train)
        out = ConvBN(mid, 3, stride=self.stride, relu=True, bn_groups=g, dtype=self.dtype, name="cb2")(out, train)
        out = ConvBN(self.features, 1, relu=False, bn_groups=g, dtype=self.dtype, name="cb3")(out, train)
        if x.shape[-1] != self.features or self.stride != 1:
            residual = ConvBN(self.features, 1, stride=self.stride, relu=False, bn_groups=g, dtype=self.dtype, name="down")(x, train)
        return nn.relu(out + residual)


class _StridedBasic(nn.Module):
    features: int
    stride: int = 1
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from .hrnet import ConvBN

        g = self.bn_groups
        residual = x
        out = ConvBN(self.features, 3, stride=self.stride, relu=True, bn_groups=g, dtype=self.dtype, name="cb1")(x, train)
        out = ConvBN(self.features, 3, relu=False, bn_groups=g, dtype=self.dtype, name="cb2")(out, train)
        if x.shape[-1] != self.features or self.stride != 1:
            residual = ConvBN(self.features, 1, stride=self.stride, relu=False, bn_groups=g, dtype=self.dtype, name="down")(x, train)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Standard ResNet returning the final 1/32-resolution feature map (and
    optionally logits when num_classes > 0)."""

    variant: str = "resnet50"
    num_classes: int = 0
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        block_type, _ = RESNET_SPECS[self.variant]
        return 512 * (4 if block_type == "bottleneck" else 1)

    @nn.compact
    def __call__(self, images, train: bool = False):
        block_type, layers = RESNET_SPECS[self.variant]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1")(images)
        x = batch_norm(x, train=train, bn_groups=self.bn_groups, dtype=self.dtype, name="bn1")
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s, (features, stride) in enumerate(zip((64, 128, 256, 512), (1, 2, 2, 2))):
            x = _ResNetBlock(block_type, features, layers[s], stride, bn_groups=self.bn_groups, dtype=self.dtype, name=f"layer{s + 1}")(x, train)
        if self.num_classes > 0:
            pooled = jnp.mean(x, axis=(1, 2))
            return jnp.asarray(nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(pooled), jnp.float32)
        return x

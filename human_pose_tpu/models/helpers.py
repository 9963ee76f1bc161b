"""Shared building blocks (counterpart of reference
src/base/architectures/helpers.py: ConvBnAct, SEBlock)."""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from .norm import batch_norm

Dtype = Any


class ConvBnAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    activation: Callable | None = nn.relu
    use_bias: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=pad, use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        x = batch_norm(
            x, train=train, bn_groups=self.bn_groups, dtype=self.dtype, name="bn"
        )
        if self.activation is not None:
            x = self.activation(x)
        return x


class SEBlock(nn.Module):
    """Squeeze-and-excitation channel attention."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))  # [N, C]
        s = nn.Dense(max(1, c // self.reduction), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)

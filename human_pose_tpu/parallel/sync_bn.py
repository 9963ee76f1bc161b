"""Per-shard ("local") BatchNorm for data-parallel training.

Under jit with a batch sharded over the data mesh, plain BatchNorm reduces
moments over the GLOBAL batch — i.e. synced BN (the reference's optional
SyncBatchNorm, src/base/model.py:42-44). The reference *default* is per-device
statistics; this module reproduces that by grouping the batch into
``num_groups`` shards (= mesh data size) and normalizing each group with its
own moments. With the leading dim sharded over the same axis, XLA keeps each
group's reduction on its own device — no collective.

Running statistics are tracked as the mean over groups (equal in expectation
to any single device's stats; eval uses running stats either way)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class LocalBatchNorm(nn.Module):
    num_groups: int = 1
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            n, h, w, _ = x.shape
            g = self.num_groups
            assert n % g == 0, f"batch {n} not divisible by {g} groups"
            xg = x.reshape(g, n // g, h, w, c).astype(jnp.float32)
            mean = xg.mean(axis=(1, 2, 3), keepdims=True)  # [g,1,1,1,c]
            var = ((xg - mean) ** 2).mean(axis=(1, 2, 3), keepdims=True)
            y = (xg - mean) / jnp.sqrt(var + self.epsilon)
            y = y.reshape(n, h, w, c)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean.mean(axis=(0, 1, 2, 3))
                ra_var.value = m * ra_var.value + (1 - m) * var.mean(axis=(0, 1, 2, 3))
        else:
            y = (x.astype(jnp.float32) - ra_mean.value) / jnp.sqrt(ra_var.value + self.epsilon)

        y = y * scale + bias
        return y.astype(self.dtype)

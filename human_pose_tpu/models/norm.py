"""BatchNorm dispatch: global-batch vs per-device statistics.

The reference trains with per-GPU BatchNorm statistics by default and offers
opt-in SyncBatchNorm (/root/reference/src/base/model.py:42-44,
experiments/keypoints/higher_hrnet_32.yaml sync_batchnorm key). Under jit with
a batch sharded over the data mesh, plain ``nn.BatchNorm`` reduces moments over
the GLOBAL batch — i.e. it *is* synced BN. To reproduce the reference default,
models take a ``bn_groups`` field:

* ``bn_groups <= 1`` → ``nn.BatchNorm``: global-batch moments (the semantics of
  the reference's ``sync_batchnorm: true``; also the exact single-device case).
* ``bn_groups = g > 1`` → ``LocalBatchNorm(num_groups=g)``: the batch is split
  into g groups (g = data-mesh size) each normalized with its own moments.
  With the leading dim sharded over the same axis, XLA keeps each group's
  reduction on its own device — per-device stats, no collective, matching the
  reference default.

Both variants expose identical param/batch_stats trees (``scale``/``bias``,
``mean``/``var`` under the same child name), so checkpoints are interchangeable.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..parallel.sync_bn import LocalBatchNorm

# torch defaults: momentum 0.1 -> flax 0.9, eps 1e-5
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def batch_norm(
    x: jnp.ndarray,
    *,
    train: bool,
    bn_groups: int = 1,
    momentum: float = BN_MOMENTUM,
    epsilon: float = BN_EPS,
    dtype: Any = jnp.float32,
    name: str = "bn",
) -> jnp.ndarray:
    """Apply BatchNorm with the configured statistics scope (see module doc).

    Must be called from inside a parent module's ``@nn.compact`` ``__call__``
    (the child binds to the caller's scope under ``name``).
    """
    if bn_groups <= 1:
        return nn.BatchNorm(
            use_running_average=not train, momentum=momentum, epsilon=epsilon,
            dtype=dtype, name=name,
        )(x)
    return LocalBatchNorm(
        num_groups=bn_groups, momentum=momentum, epsilon=epsilon, dtype=dtype,
        name=name,
    )(x, train)

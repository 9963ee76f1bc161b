"""Weight-initialization schemes applied post-init over the param pytree.

Counterparts of the reference init functions:
* keypoints: Conv/ConvTranspose kernels ~ N(0, 0.001), biases 0, BN (1, 0)
  (/root/reference/src/keypoints/model.py:19-34)
* classification: Conv kernels kaiming-normal(fan_out, relu), BN (1, 0)
  (/root/reference/src/classification/model.py:16-23)

Operating on the flax param pytree (rather than per-module initializers) keeps
model definitions clean and mirrors the reference's post-hoc ``init_weights``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _map_with_path(params, fn):
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    new_leaves = []
    for path, leaf in leaves:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        new_leaves.append(fn(keys, leaf))
    return jax.tree_util.tree_unflatten(treedef, [v for v in new_leaves])


def init_keypoints_weights(params, rng: jax.Array):
    """All conv kernels ~ N(0, std=0.001); biases zero; BN untouched
    (flax defaults are already scale=1, bias=0)."""
    counter = [0]

    def fn(keys, leaf):
        name = keys[-1]
        if name == "kernel" and leaf.ndim == 4:  # conv / conv-transpose kernels
            counter[0] += 1
            k = jax.random.fold_in(rng, counter[0])
            return 0.001 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if name == "bias" and leaf.ndim == 1:
            return jnp.zeros_like(leaf)
        return leaf

    return _map_with_path(params, fn)


def init_classification_weights(params, rng: jax.Array):
    """Conv kernels kaiming-normal with fan_out (gain for relu): for an HWIO
    kernel fan_out = H*W*O, std = sqrt(2 / fan_out)."""
    counter = [0]

    def fn(keys, leaf):
        name = keys[-1]
        if name == "kernel" and leaf.ndim == 4:
            counter[0] += 1
            k = jax.random.fold_in(rng, counter[0])
            h, w, _, o = leaf.shape
            std = float(np.sqrt(2.0 / (h * w * o)))
            return std * jax.random.normal(k, leaf.shape, leaf.dtype)
        return leaf

    return _map_with_path(params, fn)

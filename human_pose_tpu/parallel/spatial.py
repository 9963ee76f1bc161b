"""2-D (data x space) mesh — spatial partitioning beyond the reference's DDP.

The reference implements exactly one parallelism strategy: data-parallel DDP
(SURVEY.md §2.8; /root/reference/src/base/bin/train.py:16-27). On TPU, XLA's
SPMD partitioner additionally supports partitioning convolutions along a
SPATIAL dimension with automatic halo exchange over ICI. For this CNN stack
that is the natural second mesh axis (there is no sequence/attention axis):

* low-latency inference: one 512^2 image's rows spread over several chips
  instead of one chip per image;
* memory: 512^2 training activations shrink per-chip by the spatial factor,
  an alternative to rematerialization;
* small-batch training: keeps all chips busy when the global batch is
  smaller than the device count.

No model changes are needed — activations stay ``[N, H, W, C]``; sharding the
batch ``P("data", "space")`` (N over data, H over space) propagates through
every conv/BN/resize, and XLA inserts halo exchanges for the 3x3/stride-2
windows and cross-shard reductions for BatchNorm moments automatically
(global-batch BN semantics are unchanged: moments reduce over N, H and W
regardless of which of those dims is sharded).

RESOLVED GSPMD BUG — s2d packed layout: the reshape-transpose-reshape form of
space_to_depth miscompiled under H ("space") sharding on jax 0.9.0 (wrong
values, max abs err ~1.9 on unit-scale heatmaps, while the same graph was
exact under pure data sharding; isolated per-direction — depth_to_space's
transpose form is unaffected). Worked around by lowering the pack as strided
slices + concat (models/s2d.py) — value-identical single-device (pinned by
the s2d exact-parity tests) and correctly partitioned under spatial sharding
(pinned by tests/test_spatial.py s2d parity tests). The packed layout now
composes with every mesh axis; no quarantine remains.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

SPACE_AXIS = "space"

# batch leaves that have no spatial dim 1: joints are [N, persons, K, 3] and
# labels are [N]; everything else in the training batches is [N, H, ...].
_NO_SPACE_LEAVES = ("joints", "labels", "image_ids")


def make_mesh_2d(
    n_data: int, n_space: int, devices=None
) -> Mesh:
    """A (data, space) mesh. ``n_data * n_space`` must not exceed the device
    count (no silent truncation — same contract as make_mesh)."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_space
    if need > len(devices):
        raise ValueError(
            f"requested a {n_data}x{n_space} mesh but only {len(devices)} "
            f"devices are available"
        )
    grid = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[N, H, ...] arrays: batch over data, rows over space."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def shard_batch_spatial(mesh: Mesh, tree: Any) -> Any:
    """Place a (possibly nested) batch on a 2-D mesh: dim 0 over ``data``
    and dim 1 (image rows) over ``space`` — except leaves whose dim 1 is not
    spatial (joints/labels, matched by key name), which shard over ``data``
    only."""
    sp = spatial_sharding(mesh)
    dp = NamedSharding(mesh, P(DATA_AXIS))

    def place(path, x):
        keys = "/".join(
            str(getattr(k, "key", getattr(k, "idx", ""))) for k in path
        )
        no_space = any(name in keys for name in _NO_SPACE_LEAVES) or np.ndim(x) < 2
        return jax.device_put(x, dp if no_space else sp)

    return jax.tree_util.tree_map_with_path(place, tree)

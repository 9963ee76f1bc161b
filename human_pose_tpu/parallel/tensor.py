"""Tensor (channel) parallelism + optimizer-state sharding — third mesh axis.

The reference has exactly one parallelism strategy (data-parallel DDP,
/root/reference/src/base/bin/train.py:16-27). On TPU, XLA's SPMD partitioner
also supports Megatron-style column parallelism for this CNN stack with no
model changes: shard every conv kernel's OUTPUT-channel dim (and the matching
BatchNorm scale/bias/running-stats vectors) over a ``model`` mesh axis, and
GSPMD propagates — each chip computes its channel slice of every conv, and
XLA inserts the all-gathers where a consumer needs full channels (e.g. the
non-divisible 17-keypoint head) and the reduce-scatters on the backward pass,
all over ICI.

Two distinct wins, one mechanism:

* compute: convs' Cout contraction splits t ways (useful for wide variants;
  HRNet-W32's C<=256 convs are small enough that pure data parallel is
  usually faster — measure before enabling);
* memory: params AND Adam/SGD moments store 1/t per chip (optimizer-state
  sharding a la ZeRO, but expressed as plain NamedShardings on the jitted
  train step — no wrapper machinery).

Composition: the ``model`` axis combines freely with ``data`` (batch) and
``space`` (image rows, parallel/spatial.py) — ``make_mesh_3d(d, s, t)``
builds the full 3-D mesh; any axis may be 1. The s2d packed compute layout
is exact under tensor sharding (loss parity pinned in tests/test_tensor.py)
and under spatial sharding (tests/test_spatial.py; see parallel/spatial.py
for the lowering that made the spatial case correct).

Sharding rule (``tensor_spec``): a leaf shards its LAST dim over ``model``
iff that dim is divisible by the axis size — conv kernels [kh,kw,Cin,Cout]
become column-parallel, [C] batch-norm/bias vectors follow their conv, and
anything non-divisible (the 17-channel final conv, scalars like ``step``)
stays replicated. Optimizer moments mirror their params automatically
because the rule is shape-based and applied over the whole TrainState tree.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from .spatial import SPACE_AXIS

TENSOR_AXIS = "model"


def make_mesh_3d(
    n_data: int = 1, n_space: int = 1, n_tensor: int = 1, devices=None
) -> Mesh:
    """A (data, space, model) mesh; any axis may be 1 (size-1 axes make the
    PartitionSpecs uniform at zero cost). ``n_data * n_space * n_tensor``
    must not exceed the device count — no silent truncation, same contract
    as make_mesh / make_mesh_2d."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_space * n_tensor
    if need > len(devices):
        raise ValueError(
            f"requested a {n_data}x{n_space}x{n_tensor} mesh but only "
            f"{len(devices)} devices are available"
        )
    grid = np.asarray(devices[:need]).reshape(n_data, n_space, n_tensor)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS, TENSOR_AXIS))


def tensor_spec(x: Any, n_tensor: int) -> P:
    """PartitionSpec for one param/opt-state leaf: shard the last dim over
    ``model`` when divisible, otherwise replicate."""
    shape = np.shape(x)
    if len(shape) >= 2 and shape[-1] % n_tensor == 0:
        return P(*([None] * (len(shape) - 1)), TENSOR_AXIS)
    if len(shape) == 1 and shape[0] % n_tensor == 0:
        return P(TENSOR_AXIS)
    return P()


def shard_state_tensor(mesh: Mesh, tree: Any) -> Any:
    """Place a TrainState / variables tree with every leaf channel-sharded
    per ``tensor_spec`` (replicated over the data/space axes)."""
    t = mesh.shape[TENSOR_AXIS]

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, tensor_spec(x, t)))

    return jax.tree_util.tree_map(put, tree)

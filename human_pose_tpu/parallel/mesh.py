"""Device mesh + data-parallel sharding (TPU-native parallelism layer).

Replaces the reference's DDP machinery (SURVEY.md §2.8: torchrun process
group, DistributedSampler, gradient bucket all-reduce, metric all-reduce,
barriers) with JAX SPMD:

* one 1-D ``data`` mesh over all local/global devices (ICI; DCN across hosts)
* batches sharded along ``data`` with NamedSharding; params replicated
* gradients and metrics become *global* reductions automatically when the
  jitted step consumes a sharded batch and produces replicated outputs — XLA
  inserts psum/all-reduce over ICI, no wrapper class needed
* barriers are implicit in collective dataflow; an explicit one is provided
  for host-side coordination

Note on BatchNorm: with a sharded batch under jit, BN moments are computed
over the GLOBAL batch, i.e. the semantics of the reference's optional
SyncBatchNorm (src/base/model.py:42-44). The reference default (per-device
stats) corresponds to replacing the batch reduction with per-shard groups; see
``parallel.sync_bn`` for the local-stats variant.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} devices are available ({devices}); a "
                "silently truncated mesh would not exercise the requested "
                "sharding"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place every array of a (possibly nested) batch with its leading dim
    sharded across the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def barrier(name: str = "barrier") -> None:
    """True cross-process synchronization point (the TPU analog of
    dist.barrier(), reference trainer.py:195-197,288-291): every process
    blocks until all processes reach the same named point, implemented as an
    all-device collective (psum over the global device set). Single-process:
    degenerates to a trivial local collective."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def replicate_global(mesh: Mesh, tree: Any) -> Any:
    """Replicate a host-local pytree (e.g. a freshly initialized TrainState)
    over every device of the mesh, multi-host safe.

    Multi-process jit requires explicitly-global inputs; auto-replication of
    uncommitted arrays only works single-process. Every process must hold the
    same values (same-seed init — reference loads/initializes identically per
    rank before DDP broadcast, src/base/model.py:45-48)."""
    if jax.process_count() == 1:
        return replicate(mesh, tree)
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(tree, mesh, P())


def local_batch_to_global(mesh: Mesh, tree: Any) -> Any:
    """Multi-host: assemble per-process local batches into global arrays
    (counterpart of DistributedSampler per-rank sharding)."""
    if jax.process_count() == 1:
        return shard_batch(mesh, tree)
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), tree
    )

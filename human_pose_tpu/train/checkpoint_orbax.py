"""Orbax checkpoint backend (directory-based, async-capable, sharded-aware).

Alternative to the single-file flax-msgpack format in train/checkpoint.py
(reference counterpart: the torch.save/torch.load checkpoint flow,
/root/reference/src/base/trainer.py:227-291). What Orbax adds on TPU:

* per-array storage (OCDBT/zarr) written in parallel — no host-side msgpack
  marshalling of the whole tree;
* sharded arrays save/restore each shard from its owning host, so multi-host
  meshes checkpoint without gathering to host 0;
* optional async save: the device->host copy happens synchronously but the
  filesystem write proceeds in a background thread while training continues.

The payload layout mirrors the flax backend: the TrainState array tree is the
Orbax item, and the host-side states (datamodule RNG, metrics, callbacks,
logger run ids, epoch) ride along in a pickle inside the checkpoint directory.

Select with ``trainer.ckpt_backend: orbax`` (configs/base.py); paths become
directories (``last.ckpt/`` holding ``state/`` + ``host_state.pkl``).
"""

from __future__ import annotations

import pickle
import shutil
from pathlib import Path

import jax
import numpy as np

from ..loggers.pylogger import log
from .state import TrainState

_HOST_STATE = "host_state.pkl"
_ITEM = "state"


def _barrier(name: str) -> None:
    from ..parallel.mesh import barrier

    barrier(name)


def _save_args(tree):
    import orbax.checkpoint as ocp

    return ocp.args.StandardSave(tree)


def _restore_args(template):
    import orbax.checkpoint as ocp

    return ocp.args.StandardRestore(template)


def _state_to_tree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def _checkpointer(use_async: bool):
    import orbax.checkpoint as ocp

    # NOTE StandardCheckpointer is itself an AsyncCheckpointer in orbax >=0.5:
    # save() returns before the directory is finalized, so the synchronous
    # path must be an explicit blocking Checkpointer.
    if use_async:
        return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return ocp.Checkpointer(ocp.StandardCheckpointHandler())


def save_checkpoint(
    path: str | Path,
    state: TrainState,
    epoch: int,
    datamodule_state: dict | None = None,
    metrics_state: dict | None = None,
    callbacks_state: dict | None = None,
    logger_state: dict | None = None,
    use_async: bool = False,
) -> None:
    """Write an Orbax checkpoint directory at ``path``.

    With ``use_async`` the call returns once arrays are copied off-device;
    the filesystem write continues in a background thread (wait_until_finished
    happens automatically on the next save or at checkpointer GC).
    """
    path = Path(path).absolute()
    # directory prep + host-state pickle are process-0-only: on multi-host
    # meshes every process calls save_checkpoint (each host writes its own
    # array shards through orbax), and concurrent rmtree/pickle writes to the
    # same shared directory would race with orbax's coordinated save
    is_primary = jax.process_index() == 0
    if is_primary:
        path.parent.mkdir(parents=True, exist_ok=True)
        if path.exists():
            shutil.rmtree(path)
    _barrier("orbax_dir_prepared")  # nobody saves into a dir mid-rmtree
    ckptr = _checkpointer(use_async)
    ckptr.save(path / _ITEM, args=_save_args(_state_to_tree(state)))
    step = int(np.asarray(jax.device_get(state.step)))
    host = {
        "datamodule": datamodule_state,
        "metrics": metrics_state,
        "callbacks": callbacks_state,
        "logger": logger_state,
        "epoch": int(epoch),
        "step": step,
        "backend": "orbax",
    }
    if is_primary:
        with open(path / _HOST_STATE, "wb") as f:
            pickle.dump(host, f)
    if use_async:
        ckptr.wait_until_finished()
    log.info(f"saved orbax checkpoint to {path} (epoch {epoch})")


def load_checkpoint(path: str | Path) -> dict:
    """Load the host-state payload; arrays are restored lazily by
    :func:`load_train_state` (which needs the target tree structure)."""
    path = Path(path).absolute()
    with open(path / _HOST_STATE, "rb") as f:
        payload = pickle.load(f)
    payload["_orbax_path"] = path
    return payload


def load_train_state(state: TrainState, ckpt: dict) -> TrainState:
    """Restore arrays into a template TrainState (shape/dtype/sharding of the
    template decide placement, like the flax backend's map_location)."""
    import orbax.checkpoint as ocp

    path = Path(ckpt["_orbax_path"])
    template = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, _state_to_tree(state)
    )
    ckptr = _checkpointer(use_async=False)
    tree = ckptr.restore(path / _ITEM, args=_restore_args(template))
    return state.replace(
        step=jax.numpy.asarray(tree["step"]),
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )


def is_orbax_checkpoint(path: str | Path) -> bool:
    return Path(path).is_dir() and (Path(path) / _HOST_STATE).exists()


def load_params_partial(params, ckpt_path: str | Path):
    """Name-intersection partial restore of the params subtree (counterpart of
    checkpoint.load_params_partial for orbax directories)."""
    import orbax.checkpoint as ocp
    from flax.traverse_util import flatten_dict, unflatten_dict

    path = Path(ckpt_path).absolute()
    raw = _checkpointer(use_async=False).restore(
        path / _ITEM, args=_restore_args(None)
    )  # numpy tree
    src = flatten_dict(raw.get("params", raw))
    dst = flatten_dict(jax.device_get(params))
    n_loaded = 0
    for key, val in src.items():
        if key in dst and np.shape(dst[key]) == np.shape(val):
            dst[key] = np.asarray(val)
            n_loaded += 1
    log.info(f"partial load: {n_loaded}/{len(dst)} tensors matched from {ckpt_path}")
    return unflatten_dict(dst)

"""Full-state checkpoint save / load.

Counterpart of reference §3.5 (SURVEY.md): one file carrying
{module: {params, batch_stats, opt_state, step}, datamodule: host RNG states,
metrics, callbacks, logger run ids, epoch, step}. Device arrays are packed
with flax.serialization msgpack; host-side state rides along in the same dict.

``load_train_state`` restores arrays into an existing TrainState template
(shape/dtype structure must match), mirroring the reference's map_location
semantics — arrays land on the default device / sharding of the template.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..loggers.pylogger import log
from .state import TrainState


def _state_to_tree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(
    path: str | Path,
    state: TrainState,
    epoch: int,
    datamodule_state: dict | None = None,
    metrics_state: dict | None = None,
    callbacks_state: dict | None = None,
    logger_state: dict | None = None,
) -> None:
    """Serialize everything to one file (host-side pickle wrapping a msgpack
    blob for the device arrays)."""
    tree = jax.device_get(_state_to_tree(state))
    payload = {
        "module": serialization.to_bytes(tree),
        "datamodule": datamodule_state,
        "metrics": metrics_state,
        "callbacks": callbacks_state,
        "logger": logger_state,
        "epoch": int(epoch),
        "step": int(np.asarray(tree["step"])),
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    tmp.replace(path)
    log.info(f"saved checkpoint to {path} (epoch {epoch})")


@jax.jit
def _device_snapshot(tree):
    """Fresh device-side copy of every array leaf. ``jnp.copy`` at an XLA
    root is a real copy (never aliased to the parameter), so the result
    shares no buffers with ``tree`` — safe against later donation."""
    return jax.tree.map(jnp.copy, tree)


class AsyncCheckpointWriter:
    """Non-blocking checkpoint saves for the single-process flax backend.

    The expensive parts of ``save_checkpoint`` — the device->host fetch of
    params/opt-state and the pickle write — run on a background thread while
    training continues. JAX array immutability alone is NOT enough for the
    snapshot: the jitted train steps donate the TrainState buffers
    (train/steps.py ``donate_argnames``), so the arrays captured at
    ``submit`` time are invalidated as soon as the next step dispatches.
    ``submit`` therefore enqueues a device-side copy of the state *before*
    returning (dispatch order guarantees the copy reads the buffers ahead of
    the donating step), and the background thread fetches that copy.
    Host-side state dicts keep mutating (metrics storage, scheduler state),
    so they are deep-copied on the caller thread before handing off.

    One save is in flight at a time: a new ``submit`` (and ``wait``) joins
    the previous one first, so writes to best.pt/last.pt never interleave.
    Background exceptions surface on the next submit/wait.

    Multi-host note: this writer is only used when ``jax.process_count()==1``
    (the trainer falls back to synchronous saves otherwise) — the flax
    backend's cross-process barrier must be collective on the main thread.
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt-writer")
        self._future = None

    def wait(self) -> None:
        if self._future is not None:
            fut, self._future = self._future, None
            fut.result()  # joins the write; re-raises background errors

    def submit(self, path: str | Path, state: TrainState, epoch: int, **host_state) -> None:
        import copy

        self.wait()
        state = _device_snapshot(state)
        host_state = copy.deepcopy(host_state)
        self._future = self._pool.submit(
            save_checkpoint, path, state, epoch, **host_state
        )


def load_checkpoint(path: str | Path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_train_state(state: TrainState, ckpt: dict) -> TrainState:
    """Restore arrays from a checkpoint payload into a template TrainState."""
    template = jax.device_get(_state_to_tree(state))
    tree = serialization.from_bytes(template, ckpt["module"])
    return state.replace(
        step=jax.numpy.asarray(tree["step"]),
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )


def load_params_partial(params: Any, ckpt_path: str | Path) -> Any:
    """Name-intersection partial load for pretrained backbones
    (reference src/base/model.py:104-129): leaves present in both trees with
    matching shapes are taken from the checkpoint, the rest keep their fresh
    initialization. The checkpoint may be a trainer-state file (params are
    unwrapped from ckpt['module']), a bare params file, or an orbax
    checkpoint directory."""
    from ..utils.torch_interop import is_torch_checkpoint
    from .checkpoint_orbax import is_orbax_checkpoint

    if is_orbax_checkpoint(ckpt_path):
        from . import checkpoint_orbax

        return checkpoint_orbax.load_params_partial(params, ckpt_path)
    if is_torch_checkpoint(ckpt_path):
        # a reference .pt checkpoint (e.g. the published hrnet_32.pt
        # classification backbone): convert name-by-name; leaves the torch
        # tree doesn't cover keep their fresh init (reference
        # init_pretrained_weights intersection, src/base/model.py:104-129)
        from ..utils.torch_interop import load_torch_state_dict, variables_from_torch

        sd = load_torch_state_dict(ckpt_path)
        loaded = variables_from_torch(sd, {"params": jax.device_get(params)}, strict=False)
        log.info(f"converted torch checkpoint {ckpt_path} (partial, params only)")
        return loaded["params"]
    ckpt = load_checkpoint(ckpt_path)
    if "module" in ckpt:
        template = jax.device_get({"params": params})
        try:
            loaded = serialization.from_bytes(template, ckpt["module"])
            return loaded["params"]
        except Exception:
            # structure mismatch: fall back to flat-dict intersection
            from flax.traverse_util import flatten_dict, unflatten_dict

            raw = serialization.msgpack_restore(ckpt["module"])
            src = flatten_dict(raw.get("params", raw))
            dst = flatten_dict(jax.device_get(params))
            n_loaded = 0
            for key, val in src.items():
                if key in dst and np.shape(dst[key]) == np.shape(val):
                    dst[key] = np.asarray(val)
                    n_loaded += 1
            log.info(
                f"partial load: {n_loaded}/{len(dst)} tensors matched from {ckpt_path}"
            )
            return unflatten_dict(dst)
    raise ValueError(f"unrecognized checkpoint format at {ckpt_path}")

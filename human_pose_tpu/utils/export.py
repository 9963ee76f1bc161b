"""Model export (TPU-native counterpart of the reference's ONNX export,
src/base/model.py:66-75): serialize a jitted forward to StableHLO via
jax.export — the portable deployment artifact for XLA runtimes — plus an
optional flat-weights npz for interop."""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..loggers.pylogger import log


def export_stablehlo(model, variables: dict, input_shape: tuple, path: str | Path,
                     dtype=None) -> None:
    """Serialize ``model.apply(variables, x, train=False)`` for input shape
    [1, *input_shape] to a portable StableHLO artifact."""
    from jax import export as jax_export

    dtype = dtype or getattr(model, "dtype", jnp.float32)
    x = jax.ShapeDtypeStruct((1, *input_shape), dtype)

    def fwd(images):
        return model.apply(variables, images, train=False)

    exported = jax_export.export(jax.jit(fwd))(x)
    data = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    log.info(f"exported StableHLO ({len(data)} bytes) to {path}")


def export_weights_npz(variables: dict, path: str | Path) -> None:
    """Flat {path: array} npz of params + batch_stats (framework-agnostic)."""
    from flax.traverse_util import flatten_dict

    flat = {}
    for col in ("params", "batch_stats"):
        if col in variables and variables[col] is not None:
            for keys, val in flatten_dict(jax.device_get(variables[col])).items():
                flat[f"{col}/" + "/".join(keys)] = np.asarray(val)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)
    log.info(f"exported {len(flat)} weight tensors to {path}")

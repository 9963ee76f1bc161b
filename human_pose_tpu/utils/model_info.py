"""Model cost introspection (counterpart of the reference's thop/torchinfo
usage, src/keypoints/architectures/hrnet.py:403-411 and the hook-based layer
summary in src/utils/model.py:22-160): parameter counts per module group and
XLA-derived FLOPs / memory-traffic estimates for a given input shape."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def param_table(params, depth: int = 2) -> str:
    groups: dict[str, int] = {}
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        g = "/".join(keys[:depth])
        groups[g] = groups.get(g, 0) + leaf.size
        total += leaf.size
    lines = [f"{g:<50} {n:>14,}" for g, n in sorted(groups.items())]
    lines.append("-" * 66)
    lines.append(f"{'TOTAL':<50} {total:>14,}")
    return "\n".join(lines)


def model_cost(model, input_shape: tuple, batch: int = 1, train: bool = False) -> dict:
    """XLA cost analysis of one forward: flops, bytes accessed, params.

    Returns a dict with 'params', 'flops', 'bytes_accessed' (per batch)."""
    dtype = getattr(model, "dtype", jnp.float32)
    x = jnp.zeros((batch, *input_shape), dtype)
    variables = jax.eval_shape(
        lambda r: model.init(r, x, train=False), jax.random.PRNGKey(0)
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=train))
    compiled = fwd.lower(variables, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {
        "params": count_params(variables.get("params", variables)),
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }

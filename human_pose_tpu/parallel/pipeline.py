"""Pipeline parallelism (pp) — per-stage device placement + microbatching.

Completes the parallelism matrix next to data (parallel/mesh.py), spatial
(parallel/spatial.py) and tensor (parallel/tensor.py) sharding. The reference
has only DDP (/root/reference/src/base/bin/train.py:16-27); expert parallelism
is N/A for this framework (no mixture-of-experts layers anywhere in the model
zoo), which makes pp the last applicable strategy.

Honest scope note: HigherHRNet-W32 is 28.6M params — it FITS on one chip, so
for throughput pure data parallel always beats pp here (no bubbles, no
inter-stage transfers). pp is provided for the regimes where it is the right
tool: (a) serving models whose params + activations exceed one device's HBM,
(b) latency-bound serving where a single request must spread over several
chips but the batch is too small for spatial partitioning, and (c) hosts
driving heterogeneous device pools. The implementation is therefore
inference-only (training composes dp x sp x tp instead, __graft_entry__).

Design (single-controller JAX, no GSPMD needed):

* The model is cut into UNITS at its natural boundaries — ``stem``,
  ``stage1..4`` (models/hrnet.py stage_configs, the shared topology table),
  ``head`` — each a pure ``fn(vars_slice, x)`` that re-instantiates the same
  flax submodule the parent applied, bound to the SAME parameter subtree, so
  outputs are identical to the monolithic ``model.apply`` (pinned by
  tests/test_pipeline.py).
* A partition groups consecutive units into S pipeline segments; segment i's
  parameter slice is ``jax.device_put`` to device i and its chained fn is
  jitted once. Computation follows its operands, so segment i executes on
  device i; the activations hop devices via an explicit async ``device_put``
  (ICI transfer on a real pod).
* ``PipelinedModel.__call__`` walks microbatches through the segments.
  JAX dispatch is asynchronous: while device 0 runs segment 0 on microbatch
  j+1, device 1 is already running segment 1 on microbatch j — GPipe-style
  fill/drain overlap without any scheduler machinery; the bubble fraction is
  (S-1)/(S-1+M) for M microbatches.

The measured v5e stage split (TODO.md: stem+s0+s1 0.90 / s2 1.22 / s3 1.13 /
head 1.0 ms/img) makes ``DEFAULT_PARTITION`` a near-balanced 4-way cut
(max/mean ~ 1.15).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

DEFAULT_PARTITION: tuple = (
    ("stem", "stage1", "stage2"),
    ("stage3",),
    ("stage4",),
    ("head",),
)


def partition_for(n_segments: int) -> tuple:
    """Near-balanced groupings of the six units for 1-6 pipeline segments,
    by the measured v5e per-unit times (module docstring): stem 0.45 /
    stage1 0.22 / stage2 0.23 / stage3 1.22 / stage4 1.13 / head 1.0 ms/img."""
    table = {
        1: (("stem", "stage1", "stage2", "stage3", "stage4", "head"),),
        2: (("stem", "stage1", "stage2", "stage3"), ("stage4", "head")),
        3: (("stem", "stage1", "stage2", "stage3"), ("stage4",), ("head",)),
        4: DEFAULT_PARTITION,
        5: (("stem",), ("stage1", "stage2"), ("stage3",), ("stage4",), ("head",)),
        6: (("stem",), ("stage1",), ("stage2",), ("stage3",), ("stage4",), ("head",)),
    }
    if n_segments not in table:
        raise ValueError(
            f"pipeline supports 1-6 segments (6 model units), got {n_segments}"
        )
    return table[n_segments]


class Unit(NamedTuple):
    name: str
    # variables -> this unit's variable slice ({'params': ..., 'batch_stats': ...})
    slice_vars: Callable[[dict], dict]
    fn: Callable[[dict, Any], Any]  # (vars_slice, x) -> y


def _backbone_slice(variables: dict, keys: Sequence[str]) -> dict:
    out = {}
    for col in ("params", "batch_stats"):
        bb = variables[col]["backbone"]
        out[col] = {k: bb[k] for k in keys if k in bb}
    return out


def _top_slice(variables: dict, keys: Sequence[str]) -> dict:
    out = {}
    for col in ("params", "batch_stats"):
        out[col] = {k: variables[col][k] for k in keys if k in variables[col]}
    return out


def build_units(model) -> list[Unit]:
    """Cut a HigherHRNet into its pipeline units. Each unit re-instantiates
    the identical submodule configuration the parent ``@nn.compact`` body
    builds (models/higher_hrnet.py:85-120, models/hrnet.py stage table) and
    applies it to the matching parameter subtree."""
    from ..models.higher_hrnet import DeconvHeatmapsHead
    from ..models.hrnet import ConvBN, HighResolutionStage, stage_configs
    from ..models.s2d import DeconvHeatmapsHeadS2D

    g, dt, s2d = model.bn_groups, model.dtype, model.s2d
    units: list[Unit] = []

    def stem_fn(v, x):
        conv = ConvBN(64, kernel=3, stride=2, relu=True, bn_groups=g, dtype=dt)
        for name in ("stem1", "stem2"):
            sub = {c: v[c][name] for c in v}
            x = conv.apply(sub, x, False)
        return x

    units.append(Unit("stem", lambda v: _backbone_slice(v, ("stem1", "stem2")), stem_fn))

    configs = stage_configs(model.C, model.num_blocks_per_stage, model.num_units)
    for s, (nb, nu, bt, in_ch, out_ch) in enumerate(configs):
        stage = HighResolutionStage(
            nb, nu, bt, in_ch, out_ch,
            is_final_stage=s == len(configs) - 1,
            is_first_stage=s == 0,
            final_stage_single_scale=True,
            s2d=s2d, bn_groups=g, dtype=dt,
        )
        name = f"stage{s + 1}"
        units.append(
            Unit(
                name,
                lambda v, n=name: _backbone_slice(v, (n,)),
                lambda v, x, st=stage, n=name: st.apply(
                    {c: v[c][n] for c in v}, x, False
                ),
            )
        )

    def head_fn(v, xs):
        from flax import linen as nn

        feats = xs[0]
        init_hms = nn.Conv(model.num_kpts * 2, (1, 1), dtype=dt).apply(
            {"params": v["params"]["init_heatmaps_head"]}, feats
        )
        deconv_in = jnp.concatenate([feats, init_hms], axis=-1)
        Head = DeconvHeatmapsHeadS2D if s2d else DeconvHeatmapsHead
        head = Head(
            model.C, model.num_kpts,
            num_resid_blocks=model.num_deconv_resid_blocks, bn_groups=g, dtype=dt,
        )
        sub = {c: v[c]["deconv0"] for c in v if "deconv0" in v[c]}
        _, deconv_hms = head.apply(sub, deconv_in, False)
        k = model.num_kpts
        return (
            [
                jnp.asarray(init_hms[..., :k], jnp.float32),
                jnp.asarray(deconv_hms, jnp.float32),
            ],
            jnp.asarray(init_hms[..., k:], jnp.float32),
        )

    units.append(
        Unit("head", lambda v: _top_slice(v, ("init_heatmaps_head", "deconv0")), head_fn)
    )
    return units


class PipelinedModel:
    """HigherHRNet forward split over ``len(partition)`` devices, microbatched.

    ``pipe(images, microbatch_size=m)`` returns exactly what
    ``model.apply(variables, images, train=False)`` returns (parity pinned by
    tests/test_pipeline.py); segment i's params live on ``devices[i]`` and
    activations stream device-to-device.
    """

    def __init__(
        self,
        model,
        variables: dict,
        partition: Sequence[Sequence[str]] = DEFAULT_PARTITION,
        devices: Sequence | None = None,
    ):
        if devices is None:
            devices = jax.devices()[: len(partition)]
        if len(devices) < len(partition):
            raise ValueError(
                f"partition has {len(partition)} segments but only "
                f"{len(devices)} devices were given"
            )
        units = {u.name: u for u in build_units(model)}
        unknown = [n for seg in partition for n in seg if n not in units]
        if unknown:
            raise ValueError(f"unknown units {unknown}; have {sorted(units)}")

        self.devices = list(devices[: len(partition)])
        self.segments = []
        for seg_names, dev in zip(partition, self.devices):
            seg_units = [units[n] for n in seg_names]
            seg_vars = [jax.device_put(u.slice_vars(variables), dev) for u in seg_units]

            def seg_fn(vs, x, fns=tuple(u.fn for u in seg_units)):
                for f, v in zip(fns, vs):
                    x = f(v, x)
                return x

            self.segments.append((jax.jit(seg_fn), seg_vars, dev))

    def __call__(self, images, microbatch_size: int | None = None):
        n = images.shape[0]
        m = microbatch_size or n
        if n % m:
            raise ValueError(f"batch {n} not divisible by microbatch {m}")
        outs = []
        for j in range(0, n, m):
            h = images[j : j + m]
            for seg_fn, seg_vars, dev in self.segments:
                h = jax.device_put(h, dev)
                h = seg_fn(seg_vars, h)
            outs.append(h)
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)

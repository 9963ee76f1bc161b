"""Stacked Hourglass networks with intermediate supervision.

Counterpart of reference src/keypoints/architectures/hourglass.py: 4-level
encoder/decoder hourglass modules stacked ``num_stages`` times; each stage has
a head producing heatmaps (+ AE tags for the multi-person variant) that are
remapped and added back into the trunk. Stem: 7x7 s2 conv -> residual ->
maxpool -> residuals (overall 1/4 resolution trunk at 256 channels).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .helpers import ConvBnAct, max_pool_2x2, upsample_nearest_2x

Dtype = Any


class ResidualModule(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with expansion 2
    (reference hourglass.py:6-28)."""

    mid: int
    bn_groups: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.mid * self.expansion
        out = ConvBnAct(self.mid, 1, bn_groups=self.bn_groups, dtype=self.dtype, name="cba1")(x, train)
        out = ConvBnAct(self.mid, 3, bn_groups=self.bn_groups, dtype=self.dtype, name="cba2")(out, train)
        out = ConvBnAct(out_ch, 1, activation=None, bn_groups=self.bn_groups, dtype=self.dtype, name="cba3")(out, train)
        if x.shape[-1] == out_ch:
            residual = x
        else:
            residual = ConvBnAct(out_ch, 1, activation=None, bn_groups=self.bn_groups, dtype=self.dtype, name="proj")(
                x, train
            )
        return nn.relu(out + residual)


class HourglassModule(nn.Module):
    """Recursive encoder/decoder (reference hourglass.py:31-81)."""

    num_blocks: int = 4
    mid: int = 128
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residuals = []
        for i in range(self.num_blocks):
            residuals.append(
                ResidualModule(self.mid, bn_groups=self.bn_groups, dtype=self.dtype, name=f"res{i}")(x, train)
            )
            x = max_pool_2x2(x)
            x = ResidualModule(self.mid, bn_groups=self.bn_groups, dtype=self.dtype, name=f"down{i}")(x, train)
        x = ResidualModule(self.mid, bn_groups=self.bn_groups, dtype=self.dtype, name="mid")(x, train)
        for i in range(self.num_blocks):
            x = ResidualModule(self.mid, bn_groups=self.bn_groups, dtype=self.dtype, name=f"up{i}")(x, train)
            x = upsample_nearest_2x(x)
            x = x + residuals[-(i + 1)]
        return x


class _HourglassStageHead(nn.Module):
    """Stage head (reference hourglass.py:84-128): residual+1x1 trunk conv,
    heatmap (and optional tag) 1x1 heads, remap convs for reinjection."""

    mid: int
    num_kpts: int
    with_tags: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hg_out, train: bool):
        c = hg_out.shape[-1]
        feats = ResidualModule(self.mid, bn_groups=self.bn_groups, dtype=self.dtype, name="res")(hg_out, train)
        feats = ConvBnAct(c, 1, bn_groups=self.bn_groups, dtype=self.dtype, name="cba")(feats, train)
        heatmaps = nn.Conv(self.num_kpts, (1, 1), dtype=self.dtype, name="heatmaps")(feats)
        remap_feats = nn.Conv(c, (1, 1), dtype=self.dtype, name="remap_feats")(feats)
        remap_hms = nn.Conv(c, (1, 1), dtype=self.dtype, name="remap_heatmaps")(heatmaps)
        tags = None
        if self.with_tags:
            tags = nn.Conv(self.num_kpts, (1, 1), dtype=self.dtype, name="tags")(feats)
        return remap_feats, heatmaps, tags, remap_hms


class _BaseHourglassNet(nn.Module):
    num_kpts: int = 17
    num_stages: int = 2
    with_tags: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = ConvBnAct(64, 7, stride=2, bn_groups=self.bn_groups, dtype=self.dtype, name="stem")(images, train)
        x = ResidualModule(64, bn_groups=self.bn_groups, dtype=self.dtype, name="layer0")(x, train)  # -> 128
        x = max_pool_2x2(x)
        x = ResidualModule(128, bn_groups=self.bn_groups, dtype=self.dtype, name="layer1")(x, train)  # -> 256
        x = ResidualModule(128, bn_groups=self.bn_groups, dtype=self.dtype, name="layer2")(x, train)  # -> 256

        stages_hms, stages_tags = [], []
        for i in range(self.num_stages):
            residual = x
            hg = HourglassModule(4, 128, bn_groups=self.bn_groups, dtype=self.dtype, name=f"hg{i}")(x, train)
            remap_feats, hms, tags, remap_hms = _HourglassStageHead(
                128, self.num_kpts, self.with_tags, bn_groups=self.bn_groups, dtype=self.dtype, name=f"head{i}"
            )(hg, train)
            stages_hms.append(jnp.asarray(hms, jnp.float32))
            if tags is not None:
                stages_tags.append(jnp.asarray(tags, jnp.float32))
            x = residual + remap_feats + remap_hms
        return stages_hms, stages_tags


class HourglassNet(nn.Module):
    """SPPE stacked hourglass (reference hourglass.py:185-203)."""

    num_kpts: int = 17
    num_stages: int = 2
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        hms, _ = _BaseHourglassNet(
            self.num_kpts, self.num_stages, with_tags=False, bn_groups=self.bn_groups, dtype=self.dtype,
            name="trunk",
        )(images, train)
        return hms


class AEHourglassNet(nn.Module):
    """Bottom-up AE hourglass (reference hourglass.py:206-228). Returns
    (stages_kpts_heatmaps, tags_heatmaps); tags from the LAST stage feed the
    AE decode (all stages are at 1/4 resolution)."""

    num_kpts: int = 17
    num_stages: int = 2
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        hms, tags = _BaseHourglassNet(
            self.num_kpts, self.num_stages, with_tags=True, bn_groups=self.bn_groups, dtype=self.dtype,
            name="trunk",
        )(images, train)
        return hms, tags[-1]

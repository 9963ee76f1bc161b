"""HigherHRNet bottom-up pose network (TPU-native, flax.linen, NHWC).

Re-implements the behavior of the reference
(/root/reference/src/keypoints/architectures/higher_hrnet.py:7-81):

* HRNet backbone with single-scale (1/4 res, C channels) output
* ``init_heatmaps_head``: 1x1 conv C -> 2K (K keypoint heatmaps + K AE tag
  maps at 1/4 resolution)
* deconv head: concat(feats, prev_out) -> ConvTranspose(k4 s2) + BN + ReLU ->
  4x BasicBlock -> 1x1 conv -> K heatmaps at 1/2 resolution

Returns ``(stages_kpts_heatmaps, tags_heatmaps)`` where the heatmap list holds
NHWC maps at [1/4, 1/2] resolution and tags are the K channels at 1/4
resolution. Heatmap outputs are cast to float32 for loss/decode stability even
when computing in bfloat16.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .hrnet import BasicBlock, HRNetBackbone
from .norm import batch_norm
from .s2d import DeconvHeatmapsHeadS2D

Dtype = Any


class DeconvHeatmapsHead(nn.Module):
    """ConvTranspose 2x upsample + residual refinement + 1x1 heatmap conv
    (reference higher_hrnet.py:7-44)."""

    features: int
    num_kpts: int
    num_resid_blocks: int = 4
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, name="deconv",
        )(x)
        x = batch_norm(
            x, train=train, bn_groups=self.bn_groups, dtype=self.dtype, name="deconv_bn"
        )
        x = nn.relu(x)
        for i in range(self.num_resid_blocks):
            x = BasicBlock(
                self.features, bn_groups=self.bn_groups, dtype=self.dtype, name=f"resid{i}"
            )(x, train)
        heatmaps = nn.Conv(self.num_kpts, (1, 1), dtype=self.dtype, name="final_conv")(x)
        return x, heatmaps


class HigherHRNet(nn.Module):
    """HigherHRNet-W32: backbone + init head + one deconv stage
    (reference higher_hrnet.py:47-81)."""

    num_kpts: int = 17
    C: int = 32
    num_blocks_per_stage: tuple = (1, 1, 4, 3)
    num_units: int = 4
    num_deconv_resid_blocks: int = 4
    # False / True / tuple of indices: 0-3 = backbone stages, 5 = the stem
    # (see HRNetBackbone.remat), 4 = the deconv head (256^2 x 32ch
    # activations)
    remat: bool | tuple = False
    # compute the deconv head and the backbone's C<=32 branch chains in
    # space-to-depth (lane-packed) layout — same parameters, same math up to
    # fp summation order, ~1.5x faster convs and un-padded stored activations
    # (models/s2d.py). Safe single-chip and under pure data-parallel sharding;
    # QUARANTINED under spatial (H-dim) sharding — the packed graph trips an
    # XLA SPMD partitioner miscompile (parallel/spatial.py docstring); use
    # s2d=False there. Flag also kept for exact fp reproduction of the plain
    # layout.
    s2d: bool = True
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        backbone_remat = (
            self.remat if isinstance(self.remat, bool)
            else tuple(s for s in self.remat if s != 4)
        )
        deconv_remat = (
            self.remat if isinstance(self.remat, bool) else 4 in self.remat
        )
        feats = HRNetBackbone(
            self.C, final_stage_single_scale=True,
            num_blocks_per_stage=self.num_blocks_per_stage, num_units=self.num_units,
            remat=backbone_remat, s2d=self.s2d, bn_groups=self.bn_groups,
            dtype=self.dtype, name="backbone",
        )(images, train)[0]

        init_heatmaps = nn.Conv(
            self.num_kpts * 2, (1, 1), dtype=self.dtype, name="init_heatmaps_head"
        )(feats)

        deconv_in = jnp.concatenate([feats, init_heatmaps], axis=-1)
        BaseHead = DeconvHeatmapsHeadS2D if self.s2d else DeconvHeatmapsHead
        HeadCls = (
            nn.remat(BaseHead, static_argnums=(2,)) if deconv_remat else BaseHead
        )
        _, deconv_heatmaps = HeadCls(
            self.C, self.num_kpts, num_resid_blocks=self.num_deconv_resid_blocks,
            bn_groups=self.bn_groups, dtype=self.dtype, name="deconv0",
        )(deconv_in, train)

        kpts_heatmaps = [
            jnp.asarray(init_heatmaps[..., : self.num_kpts], jnp.float32),
            jnp.asarray(deconv_heatmaps, jnp.float32),
        ]
        tags_heatmaps = jnp.asarray(init_heatmaps[..., self.num_kpts :], jnp.float32)
        return kpts_heatmaps, tags_heatmaps

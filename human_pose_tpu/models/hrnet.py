"""HRNet backbone (TPU-native, flax.linen, NHWC).

Re-implements the topology of the reference backbone
(/root/reference/src/keypoints/architectures/hrnet.py:29-385) as idiomatic JAX:

* residual units: ``Bottleneck`` (expansion 4) / ``BasicBlock`` (expansion 1)
* ``HighResolutionBlock``: N residual units per scale branch
* ``FusionLayer`` after every HR block: strided 3x3 convs (high->low), identity
  (same scale), 1x1 conv + nearest 2^k upsample (low->high), summed + ReLU;
  the final stage's last fusion can emit a single high-res scale
* ``TransitionLayer`` between stages: 3x3 conv (stage1->2 only) or identity per
  existing branch, plus a stride-2 3x3 conv creating the new lowest branch
* stem: two stride-2 3x3 convs 3->64->64

Stage table (reference hrnet.py:347-353), C=32:
  [1 block,  4 units, Bottleneck, in [64],            new-branch out [C, 2C]]
  [1 block,  4 units, BasicBlock, in [C, 2C],         out [C, 2C, 4C]]
  [4 blocks, 4 units, BasicBlock, in [C, 2C, 4C],     out [C, 2C, 4C, 8C]]
  [3 blocks, 4 units, BasicBlock, in [C, 2C, 4C, 8C], out [C, 2C, 4C, 8C]]

All tensors are NHWC (TPU-preferred); compute dtype is configurable (bfloat16
for training on the MXU), parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .norm import batch_norm

Dtype = Any


class ConvBN(nn.Module):
    """3x3/1x1 conv (no bias) + BatchNorm [+ optional ReLU].

    ``bn_groups`` selects the BN statistics scope (see models.norm): 1 =
    global batch (synced), mesh-data-size = per-device (reference default).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = False
    use_bias: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = batch_norm(
            x, train=train, bn_groups=self.bn_groups, dtype=self.dtype, name="bn"
        )
        if self.relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual unit, expansion 4 (reference hrnet.py:29-74)."""

    features: int  # output channels
    stride: int = 1
    bn_groups: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.features // self.expansion
        g = self.bn_groups
        residual = x
        out = ConvBN(mid, kernel=1, relu=True, bn_groups=g, dtype=self.dtype, name="cb1")(x, train)
        out = ConvBN(mid, kernel=3, stride=self.stride, relu=True, bn_groups=g, dtype=self.dtype, name="cb2")(
            out, train
        )
        out = ConvBN(self.features, kernel=1, relu=False, bn_groups=g, dtype=self.dtype, name="cb3")(out, train)
        if x.shape[-1] != self.features:
            residual = ConvBN(
                self.features, kernel=1, stride=self.stride, relu=False, bn_groups=g,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + residual)


class BasicBlock(nn.Module):
    """two 3x3 convs residual unit, expansion 1 (reference hrnet.py:77-124)."""

    features: int
    stride: int = 1
    bn_groups: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        g = self.bn_groups
        residual = x
        out = ConvBN(self.features, kernel=3, stride=self.stride, relu=True, bn_groups=g, dtype=self.dtype, name="cb1")(
            x, train
        )
        out = ConvBN(self.features, kernel=3, stride=self.stride, relu=False, bn_groups=g, dtype=self.dtype, name="cb2")(
            out, train
        )
        if x.shape[-1] != self.features:
            residual = ConvBN(
                self.features, kernel=1, stride=self.stride, relu=False, bn_groups=g,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + residual)


_BLOCK_TYPES = {"bottleneck": Bottleneck, "basic": BasicBlock}


class HighResolutionBlock(nn.Module):
    """Per-scale stack of residual units (reference hrnet.py:127-163).

    With ``s2d`` (default), basic-block chains whose channel count underfills
    the MXU's 128 lanes by 4x (C <= 32 — the high-resolution branch) run in
    space-to-depth layout: one s2d transpose in, the whole unit chain as
    lane-packed block convs with the SAME parameters (models/s2d.py), one
    d2s out. Exact up to fp summation order; ~1.5x on the packed chain
    (prof_s2d.py) and unpadded stored activations for training.
    """

    num_units: int
    block_type: str  # "bottleneck" | "basic"
    out_channels: Sequence[int]  # per-scale output channels (in * expansion)
    s2d: bool = True
    # branch 0 arrives/leaves ALREADY in packed [N, H/2, W/2, 4C] layout (the
    # stage keeps it packed across blocks and fusions — see
    # HighResolutionStage); no per-block transposes
    packed0: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: list, train: bool) -> list:
        from .s2d import BasicBlockS2D, depth_to_space, space_to_depth

        Block = _BLOCK_TYPES[self.block_type]
        outs = []
        for i, x in enumerate(xs):
            if i == 0 and self.packed0:
                for j in range(self.num_units):
                    x = BasicBlockS2D(
                        self.out_channels[i], bn_groups=self.bn_groups,
                        dtype=self.dtype, name=f"scale{i}_unit{j}",
                    )(x, train)
                outs.append(x)
                continue
            use_s2d = (
                self.s2d
                and self.block_type == "basic"
                and self.out_channels[i] <= 32
                and x.shape[-1] == self.out_channels[i]  # no downsample branch
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            )
            if use_s2d:
                x = space_to_depth(x)
                for j in range(self.num_units):
                    x = BasicBlockS2D(
                        self.out_channels[i], bn_groups=self.bn_groups,
                        dtype=self.dtype, name=f"scale{i}_unit{j}",
                    )(x, train)
                x = depth_to_space(x)
            else:
                for j in range(self.num_units):
                    x = Block(
                        self.out_channels[i], bn_groups=self.bn_groups, dtype=self.dtype,
                        name=f"scale{i}_unit{j}",
                    )(x, train)
            outs.append(x)
        return outs


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor 2^k upsample, NHWC. Implemented as a reshape-broadcast
    (compiles to a cheap XLA broadcast, no gather)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


class FusionLayer(nn.Module):
    """All-to-all scale fusion (reference hrnet.py:166-229).

    For output scale i from input scale j:
      i > j: chain of (i-j) stride-2 3x3 conv+BN, ReLU between (not after last);
             channels stay ch[j] until the last conv which maps to ch[i]
      i == j: identity
      i < j:  1x1 conv ch[j]->ch[i] + BN + nearest upsample 2^(j-i)
    Outputs are summed and ReLU'd.
    """

    channels: Sequence[int]  # per input scale
    num_scales_out: int = -1
    # xs[0] arrives packed [N, H/2, W/2, 4C] and out 0 is emitted packed.
    # Down paths from scale 0 consume ONE depth_to_space copy; up paths INTO
    # scale 0 exploit packed(up_{2^k}(y)) == tile(up_{2^{k-1}}(y), 4) along
    # phase-major channels, so no packed-space transpose exists anywhere.
    packed0: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: list, train: bool) -> list:
        from .s2d import depth_to_space

        num_in = len(self.channels)
        num_out = self.num_scales_out if self.num_scales_out != -1 else num_in
        x0_plain = (
            depth_to_space(xs[0]) if self.packed0 and num_out > 1 else xs[0]
        )
        outs = []
        for i in range(num_out):
            acc = None
            for j in range(num_in):
                x = x0_plain if j == 0 else xs[j]
                if i > j:
                    for k in range(i - j):
                        is_last = k == (i - j) - 1
                        feats = self.channels[i] if is_last else self.channels[j]
                        x = ConvBN(
                            feats, kernel=3, stride=2, relu=not is_last,
                            bn_groups=self.bn_groups, dtype=self.dtype,
                            name=f"out{i}_in{j}_down{k}",
                        )(x, train)
                elif i < j:
                    x = ConvBN(
                        self.channels[i], kernel=1, relu=False,
                        bn_groups=self.bn_groups, dtype=self.dtype,
                        name=f"out{i}_in{j}_up",
                    )(x, train)
                    if i == 0 and self.packed0:
                        # packed 2^(j)-upsample: one fewer doubling, then the
                        # 2x2 phases all read the same source pixel
                        if j > 1:
                            x = _upsample_nearest(x, 2 ** (j - 1))
                        x = jnp.tile(x, (1, 1, 1, 4))
                    else:
                        x = _upsample_nearest(x, 2 ** (j - i))
                if i == 0 and j == 0 and self.packed0:
                    x = xs[0]  # identity contribution stays packed
                acc = x if acc is None else acc + x
            outs.append(nn.relu(acc))
        return outs


class TransitionLayer(nn.Module):
    """Stage transition (reference hrnet.py:232-284): per existing branch a
    3x3 conv+BN+ReLU (stage1->2 only) or identity; plus one stride-2 3x3
    conv+BN+ReLU on the lowest scale creating the new branch."""

    out_channels: Sequence[int]  # len == num existing branches + 1
    is_first_stage: bool
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: list, train: bool) -> list:
        outs = []
        for i, x in enumerate(xs):
            if self.is_first_stage:
                x = ConvBN(
                    self.out_channels[i], kernel=3, relu=True,
                    bn_groups=self.bn_groups, dtype=self.dtype, name=f"branch{i}",
                )(x, train)
            outs.append(x)
        new = ConvBN(
            self.out_channels[-1], kernel=3, stride=2, relu=True,
            bn_groups=self.bn_groups, dtype=self.dtype, name="new_branch",
        )(xs[-1], train)
        outs.append(new)
        return outs


class HighResolutionStage(nn.Module):
    """num_blocks x (HR block + fusion) + optional transition
    (reference hrnet.py:287-339)."""

    num_blocks: int
    num_units: int
    block_type: str
    in_channels: Sequence[int]
    out_channels: Sequence[int]  # includes the new branch's channels (last)
    is_final_stage: bool
    is_first_stage: bool
    final_stage_single_scale: bool = False
    s2d: bool = True
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool):
        from .s2d import depth_to_space, space_to_depth

        if not isinstance(xs, list):
            xs = [xs]
        Block = _BLOCK_TYPES[self.block_type]
        expansion = Block.expansion
        num_scales = len(self.in_channels)
        block_out_channels = [c * expansion for c in self.in_channels]
        fusion_channels = list(self.out_channels[:num_scales])

        # branch 0 runs the WHOLE stage in packed (space-to-depth) layout when
        # its channel count underfills the MXU lanes 4x: one transpose in, one
        # out, and each fusion's down paths read one depth_to_space copy —
        # instead of a transpose pair per block (models/s2d.py for the exact
        # reparametrization; parity pinned by tests/test_models.py and
        # tests/test_torch_parity.py)
        pack0 = (
            self.s2d
            and self.block_type == "basic"
            and block_out_channels[0] <= 32
            and xs[0].shape[-1] == block_out_channels[0]
            and xs[0].shape[1] % 2 == 0
            and xs[0].shape[2] % 2 == 0
        )
        if pack0:
            xs = [space_to_depth(xs[0])] + list(xs[1:])

        # within a stage the per-branch channels are constant across blocks:
        # bottleneck stage-1 runs at 256 ch (its single-scale "fusion" is
        # identity+ReLU, reference hrnet.py:313-318); basic stages keep
        # [C, 2C, ...] per branch.
        fuse_ch = block_out_channels if self.block_type == "bottleneck" else fusion_channels
        for b in range(self.num_blocks):
            is_final_block = b == self.num_blocks - 1
            xs = HighResolutionBlock(
                self.num_units, self.block_type, block_out_channels,
                s2d=self.s2d, packed0=pack0, bn_groups=self.bn_groups,
                dtype=self.dtype, name=f"block{b}",
            )(xs, train)
            if self.is_final_stage and is_final_block and self.final_stage_single_scale:
                num_scales_out = 1
            else:
                num_scales_out = num_scales
            xs = FusionLayer(
                fuse_ch, num_scales_out, packed0=pack0, bn_groups=self.bn_groups,
                dtype=self.dtype, name=f"fusion{b}",
            )(xs, train)

        if pack0:
            xs = [depth_to_space(xs[0])] + list(xs[1:])
        if self.is_final_stage:
            return xs
        return TransitionLayer(
            self.out_channels, self.is_first_stage, bn_groups=self.bn_groups,
            dtype=self.dtype, name="transition",
        )(xs, train)


def stage_configs(
    C: int, num_blocks_per_stage: Sequence[int] = (1, 1, 4, 3), num_units: int = 4
) -> list:
    """The 4-stage HRNet topology table (reference hrnet.py:347-353):
    ``(num_blocks, num_units, block_type, in_channels, out_channels)`` per
    stage. Single source of truth for HRNetBackbone and the pipeline-parallel
    splitter (parallel/pipeline.py), which re-instantiates the per-stage
    modules standalone."""
    C2, C4, C8 = 2 * C, 4 * C, 8 * C
    nb, nu = num_blocks_per_stage, num_units
    return [
        (nb[0], nu, "bottleneck", [64], [C, C2]),
        (nb[1], nu, "basic", [C, C2], [C, C2, C4]),
        (nb[2], nu, "basic", [C, C2, C4], [C, C2, C4, C8]),
        (nb[3], nu, "basic", [C, C2, C4, C8], [C, C2, C4, C8]),
    ]


class HRNetBackbone(nn.Module):
    """4-stage HRNet backbone (reference hrnet.py:342-385).

    Returns a list of per-scale NHWC feature maps at 1/4, 1/8, 1/16, 1/32 of
    the input resolution with C, 2C, 4C, 8C channels — or a single 1/4-scale
    C-channel map when ``final_stage_single_scale`` is set (pose heads).
    """

    C: int = 32
    final_stage_single_scale: bool = False
    # blocks per stage / residual units per block; defaults are HRNet-W*
    # (reference hrnet.py:347-353). Smaller values give shallow variants
    # (useful for tests and ablations); the scale topology is unchanged.
    num_blocks_per_stage: Sequence[int] = (1, 1, 4, 3)
    num_units: int = 4
    # rematerialize stages on the backward pass (jax.checkpoint), storing
    # activations only at stage boundaries, to fit the reference's bs-36 @512
    # training shape within v5e HBM. Accepts:
    #   False      — no remat (fastest; OOMs at bs36 @512 on a 16 GB chip)
    #   True       — remat every stage (blanket; ~16% step-time cost)
    #   (0,)       — remat selected stage indices only. Stage 1 (index 0, the
    #                bottleneck stage: 4 units of 128^2 x 256ch activations)
    #                holds the largest activations per FLOP — rematting it
    #                alone fits bs36 with ~2% recompute cost.
    #   (5,)       — index 5 remats the STEM (two stride-2 convs): its saved
    #                256^2 x 64ch output is the single largest backward
    #                allocation at bs36 (640 MB stored — XLA pads C 64->128
    #                lanes, 2.2x), and recompute is two cheap convs.
    remat: bool | tuple = False
    # run C<=32 basic-block chains in space-to-depth (lane-packed) layout —
    # same params, same math up to fp summation order (HighResolutionBlock)
    s2d: bool = True
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> list:
        C = self.C
        g = self.bn_groups
        remat_sel = (
            tuple(range(6)) if self.remat is True
            else tuple(self.remat) if self.remat else ()
        )

        # stem: two stride-2 3x3 convs 3->64->64 (reference hrnet.py:354-358).
        # As a function-level lifted transform target so remat covers BOTH
        # convs as one region (per-conv remat would still save stem1's output
        # as stem2's input) while keeping the stem1/stem2 param paths.
        def stem_fn(mdl, x, train):
            x = ConvBN(64, kernel=3, stride=2, relu=True, bn_groups=g,
                       dtype=mdl.dtype, name="stem1")(x, train)
            return ConvBN(64, kernel=3, stride=2, relu=True, bn_groups=g,
                          dtype=mdl.dtype, name="stem2")(x, train)

        if 5 in remat_sel:
            x = nn.remat(stem_fn, static_argnums=(2,))(self, x, train)
        else:
            x = stem_fn(self, x, train)

        config = stage_configs(C, self.num_blocks_per_stage, self.num_units)
        xs = x
        for s, (nb, nu, bt, in_ch, out_ch) in enumerate(config):
            StageCls = (
                nn.remat(HighResolutionStage, static_argnums=(2,))
                if s in remat_sel
                else HighResolutionStage
            )
            xs = StageCls(
                nb, nu, bt, in_ch, out_ch,
                is_final_stage=s == len(config) - 1,
                is_first_stage=s == 0,
                final_stage_single_scale=self.final_stage_single_scale,
                s2d=self.s2d,
                bn_groups=g,
                dtype=self.dtype,
                name=f"stage{s + 1}",
            )(xs, train)
        return xs


class HRNetSPPE(nn.Module):
    """Single-person HRNet head: backbone single-scale + 1x1 conv + softmax
    heatmaps (reference hrnet.py:388-400)."""

    num_keypoints: int = 17
    C: int = 32
    num_blocks_per_stage: tuple = (1, 1, 4, 3)
    num_units: int = 4
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> list:
        feats = HRNetBackbone(
            self.C, final_stage_single_scale=True,
            num_blocks_per_stage=self.num_blocks_per_stage, num_units=self.num_units,
            bn_groups=self.bn_groups, dtype=self.dtype, name="backbone",
        )(images, train)[0]
        hms = nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype, name="final_conv")(feats)
        hms = jnp.asarray(hms, jnp.float32)
        # reference applies softmax over the keypoint (channel) dim (hrnet.py:399)
        hms = nn.softmax(hms, axis=-1)
        return [hms]

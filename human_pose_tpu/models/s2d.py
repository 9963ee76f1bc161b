"""Space-to-depth (lane-packed) deconv head — exact reparametrization.

The HigherHRNet deconv head runs 3x3 convs on 256^2 x 32-channel maps. C=32
fills 32 of the MXU's 128 lanes and XLA stores the activations 4x lane-padded
(TODO.md round-2 analysis: the head's stored activations dominate training
HBM at bs36 @512, and the convs run at ~2% of MXU peak). This module computes
the SAME math on a [N, H/2, W/2, 4C] representation — 2x2 pixel blocks packed
into channels, phase-major (row-phase a, col-phase b, channel c) — where
every conv runs at full 128-lane width:

* 3x3 conv -> 3x3 block conv with a sparse [3,3,4C,4C] kernel built from the
  canonical [3,3,C,C] parameters: out phase (a,b) tap (dy,dx) reads source
  pixel 2i+a+dy = block i+qy phase py with qy=(a+dy+2)//2-1, py=(a+dy)%2.
* ConvTranspose k4 s2 SAME (the head's upsampler) -> 3x3 block conv from the
  canonical [4,4,Cin,C] parameters. flax/lax SAME padding for k=4, s=2 is
  (2, 2) around the 2x-dilated input, so out[2i+a] = sum_m w[m] xd[2i+a+m-2]:
  phase a=0 takes taps w[0]@x[i-1], w[2]@x[i]; a=1 takes w[1]@x[i], w[3]@x[i+1]
  (per spatial dim). The input is the 1/4-res feature map — not itself packed.
* BatchNorm over C channels -> reshape [N,h,w,4,C] -> [N,h,4w,C] and the
  ordinary batch_norm: identical value multiset per channel => identical
  moments, gradients, and [C]-shaped running stats.
* 1x1 head conv -> block-diagonal [1,1,4C,4K] kernel, then depth-to-space.

Parameters are declared with the SAME tree paths and shapes as the plain
modules (deconv/kernel, resid{i}/cb{1,2}/{conv/kernel, bn/...},
final_conv/{kernel,bias}), so checkpoints, golden param counts, and partial
loads are interchangeable; `s2d` is purely a compute-layout flag. Equivalence
is fp-exact up to summation order (verified to ~1e-6 in fp32 by
tests/test_models.py). Measured on v5e: the packed 8-conv chain runs 1.47x
the plain one (prof_s2d.py); training no longer stores 4x-padded head
activations.

Counterpart of the reference head it reparametrizes:
/root/reference/src/keypoints/architectures/higher_hrnet.py:7-44.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import batch_norm

Dtype = Any


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/2, W/2, 4C], phase-major (a, b, c) channels.

    Implemented as strided slices + concat (not reshape-transpose-reshape):
    value-identical, but SPMD-partitions correctly when H is sharded over a
    ``space`` mesh axis — the reshape-transpose form of THIS direction (pack)
    triggers a GSPMD wrong-result bug under H sharding (jax 0.9.0, isolated
    per-direction on the 8-device CPU mesh; the transpose form of
    depth_to_space below is unaffected). See parallel/spatial.py.

    Only H (the sharded dim) needs the slice form; W packs via a local
    reshape — [w, c] -> [w/2, 2c] is already (b, c)-minor-major, so each row
    phase a contributes channels (b, c) and the a-major concat yields the
    phase-major (a, b, c) order with no transpose anywhere."""
    n, h, w, c = x.shape
    rows = [
        x[:, a::2].reshape(n, h // 2, w // 2, 2 * c) for a in (0, 1)
    ]
    return jnp.concatenate(rows, axis=-1)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth (reshape-transpose form — correct under
    H sharding, unlike the pack direction; see space_to_depth)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)


def conv3x3_s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] -> sparse [3, 3, 4Cin, 4Cout] block-space kernel."""
    ci, co = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    qy, py = (a + dy + 2) // 2 - 1, (a + dy) % 2
                    qx, px = (b + dx + 2) // 2 - 1, (b + dx) % 2
                    ib, ob = (py * 2 + px) * ci, (a * 2 + b) * co
                    k = k.at[
                        qy + 1, qx + 1, ib : ib + ci, ob : ob + co
                    ].add(w[dy + 1, dx + 1])
    return k


def deconv4x4s2_s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[4, 4, Cin, Cout] ConvTranspose(s2, SAME) params -> [3, 3, Cin, 4Cout]
    block-space kernel (input at block res, output packed)."""
    ci, co = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, ci, 4 * co), w.dtype)
    # per-dim taps for phase a: [(block offset q, kernel index m), ...]
    taps = {0: [(-1, 0), (0, 2)], 1: [(0, 1), (1, 3)]}
    for a in range(2):
        for b in range(2):
            ob = (a * 2 + b) * co
            for qy, my in taps[a]:
                for qx, mx in taps[b]:
                    k = k.at[qy + 1, qx + 1, :, ob : ob + co].add(w[my, mx])
    return k


def _conv_same(x, kernel, dtype):
    return jax.lax.conv_general_dilated(
        jnp.asarray(x, dtype), jnp.asarray(kernel, dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class _Kernel(nn.Module):
    """Declares a conv kernel param under this module's scope — used so the
    S2D path owns canonical-shaped params at the same tree paths as the plain
    nn.Conv/nn.ConvTranspose modules it replaces."""

    shape: tuple
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        if not self.use_bias:
            return w, None
        return w, self.param("bias", nn.initializers.zeros_init(), (self.shape[-1],))


def _bn_s2d(x, *, train, bn_groups, dtype, name):
    """BatchNorm over the canonical C channels of a packed [N,h,w,4C] map."""
    n, h, w, c4 = x.shape
    y = x.reshape(n, h, w * 4, c4 // 4)
    y = batch_norm(y, train=train, bn_groups=bn_groups, dtype=dtype, name=name)
    return y.reshape(n, h, w, c4)


class ConvBNS2D(nn.Module):
    """ConvBN (3x3, no bias) computed in packed space; params match ConvBN."""

    features: int
    relu: bool = False
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        cin = x.shape[-1] // 4
        w, _ = _Kernel((3, 3, cin, self.features), name="conv")()
        x = _conv_same(x, conv3x3_s2d_kernel(w), self.dtype)
        x = _bn_s2d(
            x, train=train, bn_groups=self.bn_groups, dtype=self.dtype, name="bn"
        )
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlockS2D(nn.Module):
    """BasicBlock computed in packed space; params match BasicBlock (the head
    never changes channel count, so there is no downsample branch)."""

    features: int
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        g = self.bn_groups
        out = ConvBNS2D(self.features, relu=True, bn_groups=g, dtype=self.dtype, name="cb1")(x, train)
        out = ConvBNS2D(self.features, relu=False, bn_groups=g, dtype=self.dtype, name="cb2")(out, train)
        return nn.relu(out + x)


class DeconvHeatmapsHeadS2D(nn.Module):
    """Drop-in compute-layout variant of DeconvHeatmapsHead: same parameter
    tree, same math, activations packed [N, H/4, W/4, 4C] throughout."""

    features: int
    num_kpts: int
    num_resid_blocks: int = 4
    bn_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        cin = x.shape[-1]
        w, _ = _Kernel((4, 4, cin, self.features), name="deconv")()
        x = _conv_same(x, deconv4x4s2_s2d_kernel(w), self.dtype)
        x = _bn_s2d(
            x, train=train, bn_groups=self.bn_groups, dtype=self.dtype,
            name="deconv_bn",
        )
        x = nn.relu(x)
        for i in range(self.num_resid_blocks):
            x = BasicBlockS2D(
                self.features, bn_groups=self.bn_groups, dtype=self.dtype,
                name=f"resid{i}",
            )(x, train)
        wf, bf = _Kernel((1, 1, self.features, self.num_kpts), use_bias=True, name="final_conv")()
        # block-diagonal 1x1: each phase maps its own C -> K slice
        kf = jax.scipy.linalg.block_diag(*([wf[0, 0]] * 4))[None, None]
        hm = _conv_same(x, kf, self.dtype) + jnp.tile(jnp.asarray(bf, self.dtype), 4)
        return depth_to_space(x), depth_to_space(hm)

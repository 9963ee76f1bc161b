"""Fused residual-block conv kernel (EXPERIMENTAL — not wired into the model).

A BasicBlock at inference is conv3x3 -> BN -> ReLU -> conv3x3 -> BN -> +x ->
ReLU with BN foldable into the conv weights; this kernel runs the whole block
in one VMEM-resident pass.

Measured verdict (v5e, bf16): parity holds (<=1 bf16 ulp vs XLA) but the
kernel is 0.6-0.8x the speed of XLA's conv pair at HRNet branch shapes —
XLA's conv kernels already fuse the BN/ReLU epilogues and pipeline better
than this 9-tap-matmul formulation, whose C=32 operands waste 3/4 of the MXU
lanes. Kept as a verified starting point: the next step (TODO.md) is packing
4 pixels per register row with block-diagonal weights to fill the 128 lanes.

Row halos come from passing the (row-padded) input under three BlockSpecs —
the main tile plus one 8-row strip above and below (manual HBM DMA slices
require 8/128-aligned sizes on the tiled dims, which a 36-row x 32-channel
slab violates; blocked specs with full trailing dims are exempt). Width halos
are zero columns concatenated in-kernel (W is never tiled, so only the
image edge needs them). Both convolutions run as 9 shifted tap-matmuls on the
MXU with fp32 accumulation.

``fused_basic_block(x, w1, b1, w2, b2)``:
    z = relu(conv(relu(conv(x, w1) + b1), w2) + b2 + x)
with x [B, H, W, C] (stride 1, same channels), weights [3, 3, C, C] HWIO.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP = 8  # halo strip height (min sublane tile)


def _kernel(main_ref, top_ref, bot_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            *, TH, H, W, C):
    t = pl.program_id(1)

    # assemble rows with a 2-row halo from the strips, then 2 zero columns
    x = jnp.concatenate(
        [top_ref[0, STRIP - 2 :], main_ref[0], bot_ref[0, :2]], axis=0
    )  # [TH+4, W, C]
    zc = jnp.zeros((TH + 4, 2, C), x.dtype)
    x = jnp.concatenate([zc, x, zc], axis=1)  # [TH+4, W+4, C]

    def conv3x3(src, w_ref, bias, rows, cols):
        """src [rows+2, cols+2, C] -> [rows, cols, C] fp32 via 9 tap matmuls,
        computed in 8-row chunks to bound live fp32 accumulators (a full-tile
        accumulator chain overflows scoped VMEM)."""
        outs = []
        CH = 8
        for r0 in range(0, rows, CH):
            r = min(CH, rows - r0)
            acc = jnp.zeros((r * cols, C), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    patch = src[r0 + dy : r0 + dy + r, dx : dx + cols, :].reshape(
                        r * cols, C
                    )
                    acc = acc + jax.lax.dot_general(
                        patch, w_ref[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            outs.append((acc + bias.reshape(1, C)).reshape(r, cols, C))
        return jnp.concatenate(outs, axis=0)

    # conv1 over the halo'd slab -> y with a 1-px halo for conv2
    y = conv3x3(x, w1_ref, b1_ref[...], TH + 2, W + 2)
    y = jnp.maximum(y, 0.0)
    # conv2's SAME padding sees ZEROS outside the image; zero y's halo
    # positions that fall outside (global row t*TH + r - 1, col c - 1).
    # 3-D iotas: expanding a 2-D bool mask's minor dim is unsupported in Mosaic.
    row_g = t * TH + jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W + 2, C), 0) - 1
    col_g = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W + 2, C), 1) - 1
    inside = (row_g >= 0) & (row_g < H) & (col_g >= 0) & (col_g < W)
    y = jnp.where(inside, y, 0.0).astype(x.dtype)

    z = conv3x3(y, w2_ref, b2_ref[...], TH, W)
    residual = x[2 : 2 + TH, 2 : 2 + W, :].astype(jnp.float32)
    z = jnp.maximum(z + residual, 0.0)
    out_ref[0] = z.astype(out_ref.dtype)


def _pick_row_tile(h: int) -> int:
    for th in (32, 16, 8):  # strip indices require th % 8 == 0; 64 blows VMEM
        if h % th == 0:
            return th
    raise ValueError(f"H={h} must be a multiple of 8")


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_basic_block(x, w1, b1, w2, b2, interpret: bool = False):
    """x [B, H, W, C] (H % 8 == 0); w* [3, 3, C, C] HWIO (BN folded); b* [C]."""
    b, h, w, c = x.shape
    th = _pick_row_tile(h)
    # th rows of zero padding above/below keep every strip block in bounds
    xp = jnp.pad(x, ((0, 0), (th, th), (0, 0), (0, 0)))
    spb = th // STRIP  # strips per tile

    kernel = functools.partial(_kernel, TH=th, H=h, W=w, C=c)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            # main tile: rows [ (ti+1)*th, +th )
            pl.BlockSpec((1, th, w, c), lambda bi, ti: (bi, ti + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            # strip above: rows [ (ti+1)*th - 8, +8 )
            pl.BlockSpec((1, STRIP, w, c),
                         lambda bi, ti: (bi, (ti + 1) * spb - 1, 0, 0),
                         memory_space=pltpu.VMEM),
            # strip below: rows [ (ti+2)*th, +8 )
            pl.BlockSpec((1, STRIP, w, c),
                         lambda bi, ti: (bi, (ti + 2) * spb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda bi, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda bi, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w1, b1, w2, b2)
    return out


def reference_basic_block(x, w1, b1, w2, b2):
    """XLA reference for parity tests."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w1.astype(jnp.float32), (1, 1), "SAME", dimension_numbers=dn
    ) + b1
    y = jnp.maximum(y, 0.0)
    z = jax.lax.conv_general_dilated(
        y, w2.astype(jnp.float32), (1, 1), "SAME", dimension_numbers=dn
    ) + b2
    return jnp.maximum(z + x.astype(jnp.float32), 0.0).astype(x.dtype)


def fold_conv_bn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into a conv: returns (kernel', bias')."""
    inv = scale / jnp.sqrt(var + eps)
    return kernel * inv[None, None, None, :], bias - mean * inv

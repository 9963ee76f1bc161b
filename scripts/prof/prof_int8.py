"""Probe: is int8 conv worth an inference quantization path on v5e?

The W32 forward is HBM-bandwidth-bound at the small channel counts HRNet
lives at (round-1 roofline analysis: ~71% of HBM roofline, TODO.md). int8
halves activation/weight bytes vs bf16 and the v5e MXU runs int8 at 2x
bf16 peak — so a quantized inference path could approach 2x on the bound
stages IF XLA:TPU lowers int8 convs well at these shapes.

Times a chain of 3x3 SAME convs per (shape, dtype) with bench.py's honest
fori_loop timing. Run on the real TPU: python prof_int8.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

CHAIN = 8  # convs per iteration, amortizes loop overhead
ITERS = 20

# (label, N, H, W, C) — representative HRNet-W32 @512 stage shapes
SHAPES = [
    ("branch0 128x128xC32", 8, 128, 128, 32),
    ("branch1 64x64xC64", 8, 64, 64, 64),
    ("branch2 32x32xC128", 8, 32, 32, 128),
    ("head 128x128xC32", 24, 128, 128, 32),
]


def conv(x, w, acc_dtype):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


def time_chain(n, h, w, c, dtype):
    rng = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(rng, (n, h, w, c), -127, 127, jnp.int8)
        ws = [
            jax.random.randint(jax.random.PRNGKey(i), (3, 3, c, c), -127, 127, jnp.int8)
            for i in range(CHAIN)
        ]
        acc_dtype = jnp.int32

        def requant(y):  # int32 -> int8 with a shift, models per-layer rescale
            return (y >> 7).astype(jnp.int8)

    else:
        x = jax.random.normal(rng, (n, h, w, c), dtype)
        ws = [
            jax.random.normal(jax.random.PRNGKey(i), (3, 3, c, c), dtype) * 0.05
            for i in range(CHAIN)
        ]
        acc_dtype = jnp.float32

        def requant(y):
            return jnp.maximum(y, 0).astype(dtype)  # relu, models conv-bn-act

    @jax.jit
    def many(x, ws):
        def body(i, carry):
            acc, xx = carry
            y = xx
            for wk in ws:
                y = requant(conv(y, wk, acc_dtype))
            # fold the iteration index in so every iteration is distinct
            y = y + i.astype(y.dtype)
            return acc + jnp.float32(y.sum()), y

        acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), x))
        return acc

    float(many(x, ws))  # compile + warmup
    t0 = time.perf_counter()
    float(many(x, ws))
    dt = time.perf_counter() - t0
    per_conv_us = dt / (ITERS * CHAIN) * 1e6
    # bytes moved per conv ~ in + out activations (weights stay in VMEM-ish)
    bpe = 1 if dtype == jnp.int8 else 2
    gb = 2 * n * h * w * c * bpe / 1e9
    return per_conv_us, gb / (dt / (ITERS * CHAIN))


def main():
    print(f"{'shape':26s} {'dtype':8s} {'us/conv':>9s} {'~GB/s':>8s}")
    for label, n, h, w, c in SHAPES:
        for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
            us, gbs = time_chain(n, h, w, c, dtype)
            print(f"{label:26s} {name:8s} {us:9.2f} {gbs:8.0f}", flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmark: jax.image.resize('linear') vs an exact phase-stencil
bilinear upsample for the decode's 2x/4x heatmap resizes.

torch F.interpolate(align_corners=False) at integer factor f samples output
phase k at source offset (k+0.5)/f - 0.5: a fixed 2-tap stencil per phase and
per dim. Expressed as shifted elementwise combinations + phase interleave,
XLA fuses it into one VPU kernel at HBM roofline — jax.image.resize builds
dense [out, in] interpolation matrices and runs two tensordots instead.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 30


def timed(fn, *args):
    @jax.jit
    def many(*args):
        def body(i, acc):
            return acc + fn(i, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(many(*args))
    t0 = time.perf_counter()
    float(many(*args))
    b = args[0].shape[0]
    return (time.perf_counter() - t0) / (b * ITERS) * 1e3


def _phase_taps(f: int):
    """Per output phase k: (left shift in {-1, 0}, left weight)."""
    taps = []
    for k in range(f):
        src = (k + 0.5) / f - 0.5
        left = int(np.floor(src))
        taps.append((left, 1.0 - (src - left)))
    return taps


def upsample_bilinear_pow2(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, fH, fW, C], exact torch align_corners=False for
    integer factor f (edge-clamped half-pixel sampling)."""
    n, h, w, c = x.shape
    taps = _phase_taps(f)

    def shift(x, d, axis):  # neighbor with edge clamp, d in {-1, 0, 1}
        if d == 0:
            return x
        if d == -1:
            lead = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
            body = jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)
            return jnp.concatenate([lead, body], axis=axis)
        tail = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
        body = jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis)
        return jnp.concatenate([body, tail], axis=axis)

    # H dim: build f phase maps then interleave
    rows = []
    for left, wl in taps:
        a = shift(x, left, 1)
        b = shift(x, left + 1, 1)
        rows.append(a * wl + b * (1.0 - wl))
    y = jnp.stack(rows, axis=2).reshape(n, f * h, w, c)
    cols = []
    for left, wl in taps:
        a = shift(y, left, 2)
        b = shift(y, left + 1, 2)
        cols.append(a * wl + b * (1.0 - wl))
    return jnp.stack(cols, axis=3).reshape(n, f * h, f * w, c)


def main():
    rng = np.random.RandomState(0)
    for (bsz, hh, cc, f) in [(8, 256, 17, 2), (8, 128, 34, 4)]:
        x = jnp.asarray(rng.rand(bsz, hh, hh, cc), jnp.float32)
        want = jax.image.resize(x, (bsz, f * hh, f * hh, cc), method="linear")
        got = upsample_bilinear_pow2(x, f)
        err = float(jnp.abs(want - got).max())
        print(json.dumps({"check": f"equiv_{f}x_{hh}", "max_abs_err": err}), flush=True)

        def via_image(i, x):
            y = jax.image.resize(
                x + jnp.float32(i) * 1e-9, (bsz, f * hh, f * hh, cc), method="linear"
            )
            return y.sum()

        def via_stencil(i, x):
            return upsample_bilinear_pow2(x + jnp.float32(i) * 1e-9, f).sum()

        print(json.dumps({
            "shape": f"{bsz}x{hh}^2x{cc} f={f}",
            "jax.image_ms": round(timed(via_image, x), 4),
            "stencil_ms": round(timed(via_stencil, x), 4),
        }), flush=True)


def main_khw():
    """Channel-first variants: resize [B, K, H, W] over the trailing dims (W
    on lanes, no 17->128 lane padding) + the early-transpose cost."""
    rng = np.random.RandomState(0)
    for (bsz, hh, cc, f) in [(8, 256, 17, 2), (8, 128, 34, 4)]:
        xk = jnp.asarray(rng.rand(bsz, cc, hh, hh), jnp.float32)

        def via_image_khw(i, x):
            y = jax.image.resize(
                x + jnp.float32(i) * 1e-9, (bsz, cc, f * hh, f * hh), method="linear"
            )
            return y.sum()

        xn = jnp.asarray(rng.rand(bsz, hh, hh, cc), jnp.float32)

        def transpose_then_resize(i, x):
            xt = jnp.transpose(x + jnp.float32(i) * 1e-9, (0, 3, 1, 2))
            y = jax.image.resize(xt, (bsz, cc, f * hh, f * hh), method="linear")
            return y.sum()

        print(json.dumps({
            "shape": f"KHW {bsz}x{cc}x{hh}^2 f={f}",
            "khw_resize_ms": round(timed(via_image_khw, xk), 4),
            "nhwc_transpose_plus_khw_ms": round(timed(transpose_then_resize, xn), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
    main_khw()

"""Microbenchmark: is a 3x3 C=32 conv at 256^2 faster in space-to-depth form?

Hypothesis (TODO.md lane-packing item): C=32 convs fill <=32/128 MXU lanes;
repacking 2x2 pixel blocks into channels (H/2, W/2, 4C=128) with an
equivalent sparse 3x3 kernel runs the same math at full lane width, 4x the
nominal FLOPs but ~4x better utilization -> net win expected.

Also times the exact-equivalence construction: out == s2d^-1(conv_s2d(s2d(x)))
up to float assoc. Chain of 8 convs (the deconv-head shape) to amortize
boundary effects, fori_loop-timed.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

B, H, W, C, ITERS, CHAIN = 8, 256, 256, 32, 20, 8


def timed(fn, *args):
    @jax.jit
    def many(*args):
        def body(i, acc):
            return acc + fn(i, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(many(*args))
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / (B * ITERS) * 1e3


def s2d(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C]; phase-major channel layout
    (a, b, c) with a=row phase, b=col phase."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def make_s2d_kernel(w33):
    """Build the sparse 3x3 S2D kernel equivalent to 3x3 conv w33 [3,3,C,C].

    out phase (a,b) at block (i,j) = sum_{dy,dx} w[dy+1,dx+1] *
    x[2i+a+dy, 2j+b+dx]. Source pixel row 2i+a+dy = 2(i+q) + p with
    q = (a+dy+2)//2 - 1, p = (a+dy) % 2; block offset q in {-1,0,1}.
    """
    c = w33.shape[2]
    k = np.zeros((3, 3, 4 * c, 4 * c), np.float32)
    for a in range(2):
        for b in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    qy, py = (a + dy + 2) // 2 - 1, (a + dy) % 2
                    qx, px = (b + dx + 2) // 2 - 1, (b + dx) % 2
                    # kernel tap (qy+1, qx+1): in-channel block (py,px),
                    # out-channel block (a,b)
                    ci = (py * 2 + px) * c
                    co = (a * 2 + b) * c
                    k[qy + 1, qx + 1, ci : ci + c, co : co + c] += w33[dy + 1, dx + 1]
    return jnp.asarray(k)


def main():
    rng = np.random.RandomState(0)
    ws = [rng.randn(3, 3, C, C).astype(np.float32) * 0.05 for _ in range(CHAIN)]
    ws_b = [jnp.asarray(w, jnp.bfloat16) for w in ws]
    ws_s2d = [make_s2d_kernel(w).astype(jnp.bfloat16) for w in ws]
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    xs = s2d(x)

    # numerical equivalence check (fp32)
    xf = jnp.asarray(np.asarray(x), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        xf, jnp.asarray(ws[0]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(
        s2d(xf), make_s2d_kernel(ws[0]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.abs(s2d(ref) - got).max())
    print(json.dumps({"check": "s2d_conv_equivalence", "max_abs_err": err}), flush=True)

    def chain_plain(i, x):
        y = x + jnp.bfloat16(i) * jnp.bfloat16(1e-6)
        for w in ws_b:
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y, 0)
        return jnp.float32(y.sum())

    def chain_s2d(i, x):
        y = x + jnp.bfloat16(i) * jnp.bfloat16(1e-6)
        for w in ws_s2d:
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y, 0)
        return jnp.float32(y.sum())

    print(json.dumps({"stage": "plain_c32_256", "ms_per_img": round(timed(chain_plain, x), 4)}), flush=True)
    print(json.dumps({"stage": "s2d_c128_128", "ms_per_img": round(timed(chain_s2d, xs), 4)}), flush=True)


# --- C=64 1x2-packing probe (branch-1 candidate): pack 2 horizontal pixels,
# 2C = 128 lanes, 2x FLOP inflation. Appended for round-3 evaluation.
def s2d_w2(x):
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def make_w2_kernel(w33):
    import numpy as np
    ci, co = w33.shape[2], w33.shape[3]
    k = np.zeros((3, 3, 2 * ci, 2 * co), np.float32)
    for b in range(2):
        for dx in range(-1, 2):
            qx, px = (b + dx + 2) // 2 - 1, (b + dx) % 2
            for dy in range(-1, 2):
                k[dy + 1, qx + 1, px * ci : (px + 1) * ci, b * co : (b + 1) * co] += w33[dy + 1, dx + 1]
    return jnp.asarray(k)


def main_w2():
    import numpy as np
    B2, H2, W2, C2, CHAIN2 = 8, 128, 128, 64, 8
    rng = np.random.RandomState(0)
    ws = [rng.randn(3, 3, C2, C2).astype(np.float32) * 0.05 for _ in range(CHAIN2)]
    x = jnp.asarray(rng.randn(B2, H2, W2, C2), jnp.bfloat16)

    xf = jnp.asarray(np.asarray(x), jnp.float32)
    ref = jax.lax.conv_general_dilated(xf, jnp.asarray(ws[0]), (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(s2d_w2(xf), make_w2_kernel(ws[0]), (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.abs(s2d_w2(ref) - got).max())
    print(json.dumps({"check": "w2_conv_equivalence", "max_abs_err": err}), flush=True)

    ws_b = [jnp.asarray(w, jnp.bfloat16) for w in ws]
    ws_w2 = [make_w2_kernel(w).astype(jnp.bfloat16) for w in ws]

    def chain(i, x, kernels):
        y = x + jnp.bfloat16(i) * jnp.bfloat16(1e-6)
        for w in kernels:
            y = jax.lax.conv_general_dilated(y, w, (1, 1), "SAME",
                                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y, 0)
        return jnp.float32(y.sum())

    print(json.dumps({"stage": "plain_c64_128", "ms_per_img": round(timed(lambda i, x: chain(i, x, ws_b), x), 4)}), flush=True)
    print(json.dumps({"stage": "w2_c128_64", "ms_per_img": round(timed(lambda i, x: chain(i, x, ws_w2), s2d_w2(x)), 4)}), flush=True)



# --- stem probe: conv1 (3->64, s2, 512^2) with the image packed 2x2 so the
# contraction dim fills 48/128 instead of 27/128. Exact: same taps regrouped.
def make_stem_kernel(w33):
    import numpy as np
    ci, co = w33.shape[2], w33.shape[3]
    k = np.zeros((2, 2, 4 * ci, co), np.float32)
    for dy in range(-1, 2):
        qy, py = (-1, 1) if dy == -1 else (0, dy)
        for dx in range(-1, 2):
            qx, px = (-1, 1) if dx == -1 else (0, dx)
            k[qy + 1, qx + 1, (py * 2 + px) * ci : (py * 2 + px + 1) * ci, :] += w33[dy + 1, dx + 1]
    return jnp.asarray(k)


def main_stem():
    import numpy as np
    B3, H3 = 8, 512
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 3, 64).astype(np.float32) * 0.05
    x = jnp.asarray(rng.randn(B3, H3, H3, 3), jnp.bfloat16)

    xf = jnp.asarray(np.asarray(x), jnp.float32)
    # the real stem (ConvBN) uses torch-style symmetric padding (1,1), not SAME
    ref = jax.lax.conv_general_dilated(xf, jnp.asarray(w), (2, 2), [(1, 1), (1, 1)],
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(s2d(xf), make_stem_kernel(w), (1, 1), [(1, 0), (1, 0)],
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.abs(ref - got).max())
    print(json.dumps({"check": "stem_conv_equivalence", "max_abs_err": err}), flush=True)

    wb = jnp.asarray(w, jnp.bfloat16)
    wp = make_stem_kernel(w).astype(jnp.bfloat16)

    def plain(i, x):
        y = jax.lax.conv_general_dilated(x + jnp.bfloat16(i) * jnp.bfloat16(1e-6), wb, (2, 2), [(1, 1), (1, 1)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.float32(jnp.maximum(y, 0).sum())

    def packed(i, x):
        y = jax.lax.conv_general_dilated(x + jnp.bfloat16(i) * jnp.bfloat16(1e-6), wp, (1, 1), [(1, 0), (1, 0)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.float32(jnp.maximum(y, 0).sum())

    print(json.dumps({"stage": "stem1_plain", "ms_per_img": round(timed(plain, x), 4)}), flush=True)
    print(json.dumps({"stage": "stem1_packed", "ms_per_img": round(timed(packed, s2d(x)), 4)}), flush=True)


def make_stem1_fullpack_kernel(w33):
    """conv1 (3x3 s2, 3->64) with BOTH sides packed: [3,3,12,256] block conv,
    stride 2 in block space, pad (1,1). Out block I phase a reads input pixel
    4I+2a+dy -> block 2I + (2a+dy)//2, phase (2a+dy)%2."""
    import numpy as np
    ci, co = w33.shape[2], w33.shape[3]
    k = np.zeros((3, 3, 4 * ci, 4 * co), np.float32)
    for a in range(2):
        for b in range(2):
            for dy in range(-1, 2):
                qy, py = divmod(2 * a + dy, 2)
                for dx in range(-1, 2):
                    qx, px = divmod(2 * b + dx, 2)
                    ib, ob = (py * 2 + px) * ci, (a * 2 + b) * co
                    k[qy + 1, qx + 1, ib:ib + ci, ob:ob + co] += w33[dy + 1, dx + 1]
    return jnp.asarray(k)


def main_stem2():
    """FULL stem (conv1+relu+conv2+relu): plain vs conv1-fully-packed
    variants. A: conv2 consumes the packed map directly ([2,2,256,64]);
    B: depth_to_space between conv1 and plain conv2."""
    import numpy as np
    B3, H3 = 8, 512
    rng = np.random.RandomState(0)
    w1 = rng.randn(3, 3, 3, 64).astype(np.float32) * 0.05
    w2 = rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05
    x = jnp.asarray(rng.randn(B3, H3, H3, 3), jnp.bfloat16)

    def d2s(y):
        n, h, w, c4 = y.shape
        c = c4 // 4
        y = y.reshape(n, h, w, 2, 2, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)

    def conv(x, w, s, pad):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # equivalence in fp32
    xf = jnp.asarray(np.asarray(x), jnp.float32)
    ref = jnp.maximum(conv(jnp.maximum(conv(xf, jnp.asarray(w1), 2, [(1, 1)] * 2), 0),
                           jnp.asarray(w2), 2, [(1, 1)] * 2), 0)
    y1 = jnp.maximum(conv(s2d(xf), make_stem1_fullpack_kernel(w1), 2, [(1, 1)] * 2), 0)
    gotA = jnp.maximum(conv(y1, make_stem_kernel(w2), 1, [(1, 0)] * 2), 0)
    gotB = jnp.maximum(conv(d2s(y1), jnp.asarray(w2), 2, [(1, 1)] * 2), 0)
    print(json.dumps({"check": "stem_fullpack_equiv",
                      "errA": float(jnp.abs(ref - gotA).max()),
                      "errB": float(jnp.abs(ref - gotB).max())}), flush=True)

    w1b, w2b = jnp.asarray(w1, jnp.bfloat16), jnp.asarray(w2, jnp.bfloat16)
    w1p = make_stem1_fullpack_kernel(w1).astype(jnp.bfloat16)
    w2p = make_stem_kernel(w2).astype(jnp.bfloat16)

    def plain(i, x):
        x = x + jnp.bfloat16(i) * jnp.bfloat16(1e-6)
        y = jnp.maximum(conv(x, w1b, 2, [(1, 1)] * 2), 0)
        y = jnp.maximum(conv(y, w2b, 2, [(1, 1)] * 2), 0)
        return jnp.float32(y.sum())

    def packedA(i, x):
        x = x + jnp.bfloat16(i) * jnp.bfloat16(1e-6)
        y = jnp.maximum(conv(s2d(x), w1p, 2, [(1, 1)] * 2), 0)
        y = jnp.maximum(conv(y, w2p, 1, [(1, 0)] * 2), 0)
        return jnp.float32(y.sum())

    def packedB(i, x):
        x = x + jnp.bfloat16(i) * jnp.bfloat16(1e-6)
        y = jnp.maximum(conv(s2d(x), w1p, 2, [(1, 1)] * 2), 0)
        y = jnp.maximum(conv(d2s(y), w2b, 2, [(1, 1)] * 2), 0)
        return jnp.float32(y.sum())

    for name, fn in [("stem_plain", plain), ("stem_packedA", packedA),
                     ("stem_packedB", packedB)]:
        print(json.dumps({"stage": name, "ms_per_img": round(timed(fn, x), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
    main_w2()
    main_stem()
    main_stem2()

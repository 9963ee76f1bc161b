"""A/B the two space_to_depth/depth_to_space lowerings on TPU.

transpose: reshape-transpose-reshape (fast single-chip form, but miscompiles
  under H-sharding — parallel/spatial.py).
slice: strided slices + concat/stack (partitions correctly under spatial
  sharding).

Times a pack->unpack round trip per iteration on the head-sized map
[B, 256, 256, 32] bf16 inside one jitted fori_loop (CLAUDE.md TPU timing
rules). The round trip can't be optimized away: a conv between pack and
unpack depends on the packed layout.
"""

import json
import time

import jax
import jax.numpy as jnp

B, H, W, C = 24, 256, 256, 32
ITERS = 50


def s2d_transpose(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def d2s_transpose(x):
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)


def s2d_slice(x):
    parts = [x[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


def d2s_slice(x):
    n, h, w, c4 = x.shape
    c = c4 // 4
    ab = [x[..., i * c : (i + 1) * c] for i in range(4)]

    def cols(p0, p1):
        return jnp.stack([p0, p1], axis=3).reshape(n, h, 2 * w, c)

    top, bot = cols(ab[0], ab[1]), cols(ab[2], ab[3])
    return jnp.stack([top, bot], axis=2).reshape(n, 2 * h, 2 * w, c)


def timed(pack, unpack, x, w):
    @jax.jit
    def many(x, w):
        def body(i, acc):
            p = pack(x + jnp.bfloat16(i) * jnp.bfloat16(1e-4))
            p = jax.lax.conv_general_dilated(
                p, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return acc + unpack(p).sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(many(x, w))
    t0 = time.perf_counter()
    float(many(x, w))
    return (time.perf_counter() - t0) / (B * ITERS) * 1e3


def main():
    # the SHIPPED lowering (models/s2d.py): H via strided slices, W via a
    # local [w,c]->[w/2,2c] reshape on the pack; reshape-transpose unpack
    from human_pose_tpu.models.s2d import depth_to_space as d2s_shipped
    from human_pose_tpu.models.s2d import space_to_depth as s2d_shipped

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(rng, (3, 3, 4 * C, 4 * C), jnp.bfloat16) * 0.05
    # cross-check values agree between lowerings
    a = d2s_transpose(s2d_transpose(x.astype(jnp.float32)))
    b = d2s_slice(s2d_slice(x.astype(jnp.float32)))
    c = d2s_shipped(s2d_shipped(x.astype(jnp.float32)))
    assert float(jnp.max(jnp.abs(a - b))) == 0.0
    assert float(jnp.max(jnp.abs(a - c))) == 0.0
    for name, pack, unpack in [
        ("transpose", s2d_transpose, d2s_transpose),
        ("slice", s2d_slice, d2s_slice),
        ("slice_pack_transpose_unpack", s2d_slice, d2s_transpose),
        ("shipped_hslice_wreshape_pack", s2d_shipped, d2s_shipped),
    ]:
        ms = timed(pack, unpack, x, w)
        print(json.dumps({"lowering": name, "ms_per_img": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()

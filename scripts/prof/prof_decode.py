"""Incremental decode-stage profiler (TPU, fori_loop harness).

Times cumulative prefixes of the decode pipeline on uniform-noise maps so the
differences give per-stage cost: resize | +nms+topk | +grouping | +adjust |
+refine (= full decode_batch).
"""
import json
import time

import jax
import jax.numpy as jnp

BATCH, ITERS, SIZE, K, M = 8, 10, 512, 17, 30


def timed(fn, *args):
    @jax.jit
    def many(*args):
        def body(i, acc):
            return acc + fn(i, *args)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(many(*args))
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / (BATCH * ITERS) * 1e3


def _sparse_maps(rs, b, h, w, k, n_persons=6, sigma=2.0):
    """GT-like maps: a few gaussian peaks per joint over a sub-threshold
    background — the realistic decode workload (vs worst-case uniform noise,
    where ~90% of the M candidate rows pass det_thr)."""
    import numpy as np

    hm = (rs.rand(b, h, w, k) * 0.04).astype(np.float32)  # < det_thr 0.05
    yy, xx = np.mgrid[0:h, 0:w]
    for bi in range(b):
        for p in range(n_persons):
            cy, cx = rs.randint(0, h, 2)
            for j in range(k):
                y, x = cy + rs.randint(-6, 7), cx + rs.randint(-6, 7)
                g = np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * sigma**2))
                hm[bi, :, :, j] = np.maximum(hm[bi, :, :, j], 0.9 * g)
    return jnp.asarray(hm)


def main(scene: str = "dense"):
    from human_pose_tpu.ops.heatmaps import average_stages, resize_bilinear
    from human_pose_tpu.ops import grouping as G

    rngs = jax.random.split(jax.random.PRNGKey(3), 3)
    hq, hh = SIZE // 4, SIZE // 2
    if scene == "sparse":
        import numpy as np

        rs = np.random.RandomState(3)
        nz_q = _sparse_maps(rs, BATCH, hq, hq, K)
        nz_h = _sparse_maps(rs, BATCH, hh, hh, K)
        nz_t = jax.random.normal(rngs[2], (BATCH, hq, hq, K))
    else:
        nz_q = jax.random.uniform(rngs[0], (BATCH, hq, hq, K))
        nz_h = jax.random.uniform(rngs[1], (BATCH, hh, hh, K))
        nz_t = jax.random.normal(rngs[2], (BATCH, hq, hq, K))

    def prep(i):
        # mirrors ops/decode.decode_batch: transpose at source res, then
        # channel-major resize (bit-exact vs the NHWC-then-transpose form)
        jit = jnp.float32(i) * 1e-6
        qk = jnp.transpose(nz_q + jit, (0, 3, 1, 2))
        hk = jnp.transpose(nz_h + jit, (0, 3, 1, 2))
        kpts = resize_bilinear(
            average_stages([qk, hk], channel_major=True), SIZE, SIZE,
            channel_major=True,
        )
        tgs = jnp.stack(
            [resize_bilinear(jnp.transpose(nz_t + jit, (0, 3, 1, 2)),
                             SIZE, SIZE, channel_major=True)],
            axis=-1,
        )
        return kpts, tgs

    def s_resize(i, *a):
        kpts, tgs = prep(i)
        return kpts.sum() + tgs.sum() * 0

    def s_topk(i, *a):
        kpts, tgs = prep(i)
        tags_k, coords_k, scores_k = jax.vmap(lambda kh, th: G.top_k(kh, th, M))(kpts, tgs)
        return scores_k.sum() + tags_k.sum() * 0 + jnp.float32(coords_k.sum()) * 0

    def group(kpts, tgs):
        tags_k, coords_k, scores_k = jax.vmap(lambda kh, th: G.top_k(kh, th, M))(kpts, tgs)
        from human_pose_tpu.ops.pallas_match import match_by_tag_pallas_batched
        cand = jnp.concatenate(
            [coords_k.astype(jnp.float32), scores_k[..., None], tags_k], axis=-1)
        order = G.JOINTS_ORDER[:K]
        cand_ordered = cand[:, jnp.asarray(order)]
        grouped, count = match_by_tag_pallas_batched(
            cand_ordered, det_thr=0.05, tag_thr=0.5, joints_order=tuple(order),
            num_persons=M)
        return grouped, count, kpts, tgs

    def s_group(i, *a):
        grouped, count, _, _ = group(*prep(i))
        return grouped.sum() + jnp.float32(count.sum()) * 0

    def s_adjust(i, *a):
        grouped, count, kpts, _ = group(*prep(i))
        grouped = jax.vmap(G.adjust)(grouped, kpts)
        return grouped.sum()

    def s_full(i, *a):
        from human_pose_tpu.ops import decode_batch
        jit = jnp.float32(i) * 1e-6
        _, scores, _ = decode_batch(
            [nz_q + jit, nz_h + jit], [nz_t + jit], input_hw=(SIZE, SIZE),
            max_num_people=M, det_thr=0.05, tag_thr=0.5)
        return scores.sum()

    for name, fn in [("resize", s_resize), ("+nms_topk", s_topk),
                     ("+grouping", s_group), ("+adjust", s_adjust),
                     ("full", s_full)]:
        print(json.dumps({"scene": scene, "stage": name,
                          "cum_ms_per_img": round(timed(fn), 3)}),
              flush=True)


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "dense")

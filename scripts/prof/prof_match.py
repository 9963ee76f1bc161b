"""Micro-profiler for the batched Pallas grouping kernel alone (TPU).

Dense worst case: all M candidate rows above det_thr, random tags.
Usage: python prof_match.py [dense|sparse]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, K, M, E = 8, 17, 30, 1
F = 3 + E
ITERS = 10
JOINTS_ORDER = tuple(range(K))


def make_cand(scene: str):
    rs = np.random.RandomState(0)
    xy = rs.randint(0, 512, (B, K, M, 2)).astype(np.float32)
    if scene == "dense":
        scores = rs.rand(B, K, M).astype(np.float32)  # ~95% above det_thr 0.05
    else:
        scores = np.where(
            np.arange(M)[None, None, :] < 6, rs.rand(B, K, M), 0.01
        ).astype(np.float32)
    # score-sorted descending, as top_k produces
    scores = -np.sort(-scores, axis=-1)
    tags = rs.randn(B, K, M, E).astype(np.float32)
    return jnp.asarray(
        np.concatenate([xy, scores[..., None], tags], axis=-1), jnp.float32
    )


def timed(fn, cand):
    @jax.jit
    def many(cand):
        def body(i, acc):
            j, c = fn(cand + jnp.float32(i) * 1e-6)
            return acc + j.sum() + jnp.float32(c.sum())

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(many(cand))
    t0 = time.perf_counter()
    float(many(cand))
    return (time.perf_counter() - t0) / (B * ITERS) * 1e3


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "dense"
    cand = make_cand(scene)
    import functools
    from human_pose_tpu.ops import pallas_match as PM

    fns = {
        f"batched_u{u}": functools.partial(
            PM.match_by_tag_pallas_batched,
            det_thr=0.05, tag_thr=0.5, joints_order=JOINTS_ORDER, num_persons=M,
            unroll=u,
        )
        for u in (1, 2, 4, 8)
    }
    for name, fn in fns.items():
        print(
            json.dumps(
                {"scene": scene, "kernel": name, "ms_per_img": round(timed(fn, cand), 3)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

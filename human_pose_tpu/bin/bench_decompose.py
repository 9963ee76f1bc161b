"""Headline-bench decomposition: forward vs decode, best vs worst case.

Times each stage of the bench.py pipeline separately on the local device,
using the same honest harness (N iterations inside one jitted fori_loop, one
host fetch depending on every iteration — see CLAUDE.md on why per-dispatch
timing through the axon tunnel lies):

  forward        bf16 HigherHRNet-W32 @512, model outputs only
  decode_sparse  decode_batch on GT-like splat heatmaps (few clean peaks) —
                 the production regime once the model is trained
  decode_noise   decode_batch on uniform-noise heatmaps — adversarial worst
                 case for the AE grouping (every NMS survivor is a candidate,
                 Hungarian runs maximal augmenting paths). This bounds how far
                 dense scenes can drag the headline number (the reference's
                 CPU Munkres has the same data-dependence, grouping.py:85-145).
  e2e            forward + decode fused in one graph (what bench.py reports)

Usage: python -m human_pose_tpu.bin.bench_decompose [--batch=8] [--iters=10]

Prints one JSON line per stage: {"stage", "ms_per_img", "img_per_s"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def _timed(fn, *args, iters: int):
    """Compile, then time ITERS in-graph iterations; returns seconds total."""

    @jax.jit
    def many(*args):
        def body(i, acc):
            return acc + fn(i, *args)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    acc = float(many(*args))
    assert acc == acc, "NaN in benched computation"
    t0 = time.perf_counter()
    float(many(*args))
    return time.perf_counter() - t0


def _sparse_heatmaps(rng, batch, size, k):
    """GT-like maps: a few gaussian peaks per joint channel, near-zero
    elsewhere (what a trained model emits on typical COCO scenes)."""
    h = w = size
    n_persons = 4
    ky, kx = jnp.mgrid[0:h, 0:w]
    rngs = jax.random.split(rng, 3)
    cy = jax.random.uniform(rngs[0], (batch, n_persons, k), minval=0.1 * h, maxval=0.9 * h)
    cx = jax.random.uniform(rngs[1], (batch, n_persons, k), minval=0.1 * w, maxval=0.9 * w)
    d2 = (
        (ky[None, None, None] - cy[..., None, None]) ** 2
        + (kx[None, None, None] - cx[..., None, None]) ** 2
    )
    hm = jnp.max(jnp.exp(-d2 / (2 * 8.0**2)), axis=1)  # [B, K, H, W]
    # random small tags exercise grouping without degenerate all-match
    tags = jax.random.normal(rngs[2], (batch, k, h, w)) * 0.1
    return jnp.transpose(hm, (0, 2, 3, 1)), jnp.transpose(tags, (0, 2, 3, 1))


def main() -> None:
    batch, iters, size = 8, 10, 512
    for tok in sys.argv[1:]:
        if tok.startswith("--batch="):
            batch = int(tok.split("=")[1])
        elif tok.startswith("--iters="):
            iters = int(tok.split("=")[1])
        elif tok.startswith("--size="):
            size = int(tok.split("=")[1])

    from human_pose_tpu.models import HigherHRNet
    from human_pose_tpu.ops import decode_batch

    rng = jax.random.PRNGKey(0)
    model = HigherHRNet(num_kpts=17, C=32, dtype=jnp.bfloat16)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), train=False)
    images = jax.random.normal(rng, (batch, size, size, 3), jnp.bfloat16)

    def report(stage, dt):
        ms = dt / (batch * iters) * 1e3
        print(
            json.dumps(
                {
                    "stage": stage,
                    "ms_per_img": round(ms, 3),
                    "img_per_s": round(batch * iters / dt, 1),
                }
            ),
            flush=True,
        )

    # ---- forward only
    def fwd(i, variables, images):
        stages_hms, tags = model.apply(
            variables, images + jnp.bfloat16(i) * jnp.bfloat16(1e-4), train=False
        )
        return jnp.float32(stages_hms[-1].sum()) + jnp.float32(tags.sum()) * 0

    report("forward", _timed(fwd, variables, images, iters=iters))

    # ---- decode only, on precomputed maps at model output resolutions
    def make_decode(hm_q, hm_h, tags_q):
        def dec(i, hm_q, hm_h, tags_q):
            jitter = jnp.float32(i) * 1e-6
            _, scores, _ = decode_batch(
                [hm_q + jitter, hm_h + jitter],
                [tags_q],
                input_hw=(size, size),
                max_num_people=30,
                det_thr=0.05,
                tag_thr=0.5,
            )
            return scores.sum()

        return dec

    k = 17
    hq, hh = size // 4, size // 2
    sp_q, tg_q = _sparse_heatmaps(jax.random.PRNGKey(1), batch, hq, k)
    sp_h, _ = _sparse_heatmaps(jax.random.PRNGKey(2), batch, hh, k)
    report(
        "decode_sparse",
        _timed(make_decode(sp_q, sp_h, tg_q), sp_q, sp_h, tg_q, iters=iters),
    )

    rngs = jax.random.split(jax.random.PRNGKey(3), 3)
    nz_q = jax.random.uniform(rngs[0], (batch, hq, hq, k))
    nz_h = jax.random.uniform(rngs[1], (batch, hh, hh, k))
    nz_t = jax.random.normal(rngs[2], (batch, hq, hq, k))
    report(
        "decode_noise",
        _timed(make_decode(nz_q, nz_h, nz_t), nz_q, nz_h, nz_t, iters=iters),
    )

    # ---- end to end (bench.py's graph)
    def e2e(i, variables, images):
        stages_hms, tags = model.apply(
            variables, images + jnp.bfloat16(i) * jnp.bfloat16(1e-4), train=False
        )
        _, scores, _ = decode_batch(
            stages_hms, [tags], input_hw=(size, size),
            max_num_people=30, det_thr=0.05, tag_thr=0.5,
        )
        return scores.sum()

    report("e2e", _timed(e2e, variables, images, iters=iters))


if __name__ == "__main__":
    main()

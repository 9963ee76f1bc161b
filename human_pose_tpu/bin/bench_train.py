"""Training-step throughput benchmark (BASELINE.json config: "HigherHRNet-W32
COCO training (heatmap+AE loss, crowd masks) data-parallel").

Measures a full train step — forward, loss, backward, optimizer update — at
the reference's training shapes on the local device(s):

* keypoints (default): HigherHRNet-W32, heatmap MSE + AE push/pull, Adam,
  bs 36 @ 512 (experiments/keypoints/higher_hrnet_32.yaml)
* classification: ClassificationHRNet-W32, CE loss, SGD momentum 0.9,
  bs 80 @ 224 (experiments/classification/hrnet_32.yaml, reference
  src/classification/bin/train.py:5-6 trains this on 2 GPUs)

Usage:

    python -m human_pose_tpu.bin.bench_train [--task=keypoints|classification]
        [--batch=N] [--size=N] [--iters=5] [--remat=false|true|0,4] [--C=32]

Measurement: N steps inside ONE jitted fori_loop with the state threading
through and the batch synthesized on-device per iteration. This matches the
memory profile of real training, where batch buffers arrive fresh from the
host and are donated to the step (train/steps.py) — a loop-invariant batch
would stay pinned in HBM and OOM shapes that real training fits. It also
keeps the axon tunnel's per-dispatch latency out of the numbers (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    # with the S2D deconv head (models/s2d.py) bs36 @512 fits with NO remat
    # at 75.2 img/s on a 16 GB v5e. With the plain head the measured matrix
    # was: no-remat/stem-only OOM at compile accounting (+~270 MB); (0,)/(4,)
    # pass accounting but die at RUNTIME (the runtime reserves ~0.3 GB the
    # AOT accounting does not — treat <300 MB compile slack as not fitting);
    # (1,4) ran at 58.2 img/s.
    task = "classification" if "--task=classification" in sys.argv[1:] else "keypoints"
    batch, size, iters, remat = (36, 512, 5, False) if task == "keypoints" else (80, 224, 10, False)
    width = 32
    for tok in sys.argv[1:]:
        if tok.startswith("--C="):
            width = int(tok.split("=")[1])
        if tok.startswith("--batch="):
            batch = int(tok.split("=")[1])
        if tok.startswith("--size="):
            size = int(tok.split("=")[1])
        if tok.startswith("--iters="):
            iters = int(tok.split("=")[1])
        if tok.startswith("--remat="):
            val = tok.split("=")[1].lower()
            if val in ("true", "false"):
                remat = val == "true"
            else:  # comma-separated stage indices, e.g. --remat=0 or --remat=0,4
                remat = tuple(int(v) for v in val.split(",") if v)

    from human_pose_tpu.models import ClassificationHRNet, HigherHRNet
    from human_pose_tpu.parallel import make_mesh, replicate
    from human_pose_tpu.train import TrainState, create_optimizer
    from human_pose_tpu.train.steps import (
        classification_train_step_body,
        keypoints_train_step_body,
    )

    if task == "keypoints":
        model = HigherHRNet(num_kpts=17, C=width, remat=remat, dtype=jnp.bfloat16)
        tx = create_optimizer("Adam", lr=1e-3)
    else:
        model = ClassificationHRNet(num_classes=1000, C=32, remat=bool(remat), dtype=jnp.bfloat16)
        tx = create_optimizer("SGD", lr=0.1, momentum=0.9, weight_decay=1e-4, nesterov=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), train=False)
    state = TrainState.create(model.apply, variables["params"], variables["batch_stats"], tx)

    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None
    if mesh is not None:
        state = replicate(mesh, state)

    k, p = 17, 30

    def synth_batch(i):
        """Cheap deterministic on-device batch, distinct per iteration — lives
        only inside the step like a donated host batch would."""
        f = jnp.float32(i)

        def ramp(shape, scale):
            n = 1
            for d in shape:
                n *= d
            v = jnp.arange(n, dtype=jnp.float32) * (scale / n) + f * 1e-3
            return v.reshape(shape)

        return {
            "images": ramp((batch, size, size, 3), 1.0),
            "heatmaps": [
                ramp((batch, size // 4, size // 4, k), 1.0),
                ramp((batch, size // 2, size // 2, k), 1.0),
            ],
            "masks": [
                jnp.ones((batch, size // 4, size // 4), jnp.float32),
                jnp.ones((batch, size // 2, size // 2), jnp.float32),
            ],
            "joints": jnp.ones((batch, p, k, 3), jnp.int32),
        }

    @jax.jit
    def many(state):
        def body(i, carry):
            state, _ = carry
            if task == "keypoints":
                state, metrics = keypoints_train_step_body(state, synth_batch(i), 1e-3)
            else:
                b = synth_batch(i)
                labels = (jnp.arange(batch, dtype=jnp.int32) + i) % 1000
                state, metrics = classification_train_step_body(
                    state, b["images"], labels, 0.1
                )
            return state, metrics["loss"]

        return jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0.0)))

    state, loss = many(state)  # compile + warmup
    _ = float(loss)
    t0 = time.perf_counter()
    state, loss = many(state)
    loss = float(loss)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "train images/sec %s @%d (bs %d, %d devices)" % (
                    f"HigherHRNet-W{width}" if task == "keypoints"
                    else "ClassificationHRNet-W32",
                    size, batch, n_dev),
                "value": round(batch * iters / dt, 2),
                "unit": "images/sec",
                "ms_per_step": round(1000 * dt / iters, 1),
                "loss": round(loss, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Training-step throughput benchmark (BASELINE.json config: "HigherHRNet-W32
COCO training (heatmap+AE loss, crowd masks) data-parallel").

Measures the jitted keypoints train step — forward, crowd-masked heatmap MSE +
AE push/pull, backward, Adam update — at the reference's training shape
(bs 36 @ 512, experiments/keypoints/higher_hrnet_32.yaml) on the local
device(s). Usage:

    python -m human_pose_tpu.bin.bench_train [--batch=36] [--size=512] [--iters=5]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    batch, size, iters, remat = 36, 512, 5, True
    for tok in sys.argv[1:]:
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

    from human_pose_tpu.models import HigherHRNet
    from human_pose_tpu.parallel import make_mesh, replicate, shard_batch
    from human_pose_tpu.train import TrainState, create_optimizer
    from human_pose_tpu.train.steps import keypoints_train_step

    model = HigherHRNet(num_kpts=17, C=32, remat=remat, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), train=False)
    tx = create_optimizer("Adam", lr=1e-3)
    state = TrainState.create(model.apply, variables["params"], variables["batch_stats"], tx)

    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None
    if mesh is not None:
        state = replicate(mesh, state)

    rs = np.random.RandomState(0)
    k, p = 17, 30
    batch_data = {
        "images": rs.rand(batch, size, size, 3).astype(np.float32),
        "heatmaps": [
            rs.rand(batch, size // 4, size // 4, k).astype(np.float32),
            rs.rand(batch, size // 2, size // 2, k).astype(np.float32),
        ],
        "masks": [
            np.ones((batch, size // 4, size // 4), np.float32),
            np.ones((batch, size // 2, size // 2), np.float32),
        ],
        "joints": rs.randint(0, size // 4, (batch, p, k, 3)).astype(np.int32),
    }
    batch_data = (
        shard_batch(mesh, batch_data) if mesh is not None
        else jax.tree_util.tree_map(jnp.asarray, batch_data)
    )

    # warmup/compile, then iterate with the state threading through (an honest
    # dependent chain); sync by fetching the final loss
    state, metrics = keypoints_train_step(state, batch_data, 1e-3)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = keypoints_train_step(state, batch_data, 1e-3)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "train images/sec HigherHRNet-W32 @512 (bs %d, %d devices)" % (batch, n_dev),
                "value": round(batch * iters / dt, 2),
                "unit": "images/sec",
                "ms_per_step": round(1000 * dt / iters, 1),
                "loss": round(loss, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

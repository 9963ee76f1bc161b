"""Serving benchmark: closed-loop concurrent load on the dynamic batcher.

Measures what a deployment cares about — per-request latency percentiles and
aggregate throughput — for the keypoints inference server
(inference/serving.py) on the local accelerator, bypassing HTTP (threaded
submit() calls; the HTTP layer adds ~1 ms/req on localhost and is covered by
tests/test_serving.py).

    python -m human_pose_tpu.bin.bench_serve [--concurrency=16] [--requests=8]
        [--input_size=512] [--max_batch=16] [--max_wait_ms=5] [--tiny]
        [--compact_inputs=true]  # uint8 upload + on-device normalize

Prints one JSON line: {p50_ms, p95_ms, p99_ms, throughput_rps,
mean_batch_size, ...}.
"""

from __future__ import annotations

import json
import sys
import threading
import time

import jax
import numpy as np


def main() -> None:
    from human_pose_tpu.utils.argv import parse_flags

    args, _ = parse_flags(
        sys.argv[1:],
        {
            "concurrency": 16, "requests": 8, "input_size": 512,
            "max_batch": 16, "max_wait_ms": 5.0, "tiny": False,
            "compact_inputs": False,
        },
    )

    from human_pose_tpu.inference import InferenceKeypointsModel
    from human_pose_tpu.inference.serving import (
        BatchedKeypointsPredictor, DynamicBatcher,
    )
    from human_pose_tpu.models import HigherHRNet

    if args["tiny"]:
        model = HigherHRNet(
            num_kpts=17, C=8, num_blocks_per_stage=(1, 1, 1, 1), num_units=1,
            num_deconv_resid_blocks=1,
        )
    else:
        model = HigherHRNet(num_kpts=17, C=32, dtype=jax.numpy.bfloat16)
    size = args["input_size"]
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False
    )
    im = InferenceKeypointsModel(
        model, dict(variables), input_size=size, max_num_people=30,
        compact_inputs=args["compact_inputs"],
    )
    batcher = DynamicBatcher(
        BatchedKeypointsPredictor(im),
        max_batch=args["max_batch"], max_wait_ms=args["max_wait_ms"],
    )

    rs = np.random.RandomState(0)
    # square raw images -> one shape bucket (the deployment-steady state)
    images = [
        (rs.rand(size, size, 3) * 255).astype(np.uint8) for _ in range(4)
    ]
    # warmup EVERY power-of-two batch bucket the batcher can form, so the
    # measurement window times serving, not XLA compiles
    batcher.predictor.warmup(images[0], args["max_batch"])

    latencies: list[float] = []
    lock = threading.Lock()

    def client(i: int) -> None:
        for r in range(args["requests"]):
            t0 = time.perf_counter()
            batcher.submit(images[(i + r) % len(images)], timeout=600.0)
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                latencies.append(dt)

    threads = [
        threading.Thread(target=client, args=(i,))
        for i in range(args["concurrency"])
    ]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    batcher.close()

    lat = np.sort(np.asarray(latencies))
    stats = batcher.stats()
    print(json.dumps({
        "requests": len(lat),
        "concurrency": args["concurrency"],
        "input_size": size,
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
        "throughput_rps": round(len(lat) / wall, 2),
        "mean_batch_size": stats["mean_batch_size"],
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()

"""Serial vs batched eval throughput at production shape (real TPU).

Measures the designed advantage of inference/batched_eval.py over the
reference-equivalent serial loop (bin/eval_keypoints.evaluate_dataset):
per-image dispatch + full-heatmap device->host transfer vs whole-batch
dispatch fetching only decoded joints.

CAVEAT (CLAUDE.md): the axon tunnel adds 60-150 ms host RTT per dispatch and
its device->host bandwidth is far below local PCIe/ICI, so the SERIAL number
here is worse than a local host would see (it transfers ~80 MB of heatmaps
per image); the batched number transfers KBs and is close to honest. Treat
the ratio as an upper bound and the batched img/s as the eval throughput.

Usage: python prof_eval.py [n_images=32] [batch=16] [--no-serial]

Also times the batched evaluator with ``inference.compact_inputs`` (uint8
through the tunnel instead of bf16x2 — 2x fewer upload bytes; on local PCIe
it is 4x vs a hypothetical fp32 upload).
"""

from __future__ import annotations

import sys
import time

import jax.numpy as jnp
import numpy as np


class _ShimDataset:
    """Minimal dataset shim: one raw size -> one compile bucket."""

    def __init__(self, n: int, raw_hw=(427, 640)):
        rng = np.random.RandomState(0)
        self._imgs = [
            (rng.rand(*raw_hw, 3) * 255).astype(np.uint8) for _ in range(n)
        ]
        self.images_filepaths = [f"{i:012d}.jpg" for i in range(n)]

    def __len__(self):
        return len(self._imgs)

    def load_image(self, i):
        return self._imgs[i]

    def load_annot(self, i):
        return None


def main() -> None:
    args = []
    no_serial = False
    for tok in sys.argv[1:]:
        if tok == "--no-serial":
            no_serial = True
        elif tok.startswith("--"):
            raise SystemExit(f"unknown flag: {tok} (only --no-serial)")
        else:
            args.append(tok)
    n = int(args[0]) if args else 32
    batch = int(args[1]) if len(args) > 1 else 16

    from human_pose_tpu.bin.eval_keypoints import evaluate_dataset
    from human_pose_tpu.inference import (
        InferenceKeypointsModel,
        evaluate_dataset_batched,
    )
    from human_pose_tpu.models import HigherHRNet

    import jax

    model = HigherHRNet(num_kpts=17, C=32, dtype=jnp.bfloat16)
    variables = dict(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                   train=False)
    )
    ds = _ShimDataset(n)
    im = InferenceKeypointsModel(model, variables, input_size=512, max_num_people=30)

    im_c = InferenceKeypointsModel(
        model, variables, input_size=512, max_num_people=30, compact_inputs=True
    )

    # warmup/compile the measured paths on a handful of images
    if not no_serial:
        evaluate_dataset(im, ds, limit=2)
    evaluate_dataset_batched(im, ds, batch_size=batch, limit=batch, progress=False)
    evaluate_dataset_batched(im_c, ds, batch_size=batch, limit=batch, progress=False)

    t_serial = None
    if not no_serial:
        t0 = time.perf_counter()
        evaluate_dataset(im, ds)
        t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    evaluate_dataset_batched(im, ds, batch_size=batch, progress=False)
    t_batched = time.perf_counter() - t0

    t0 = time.perf_counter()
    evaluate_dataset_batched(im_c, ds, batch_size=batch, progress=False)
    t_compact = time.perf_counter() - t0

    print({
        "n_images": n,
        "batch": batch,
        "serial_img_s": round(n / t_serial, 2) if t_serial else None,
        "batched_img_s": round(n / t_batched, 2),
        "batched_compact_img_s": round(n / t_compact, 2),
        "speedup_batched_vs_serial": round(t_serial / t_batched, 2) if t_serial else None,
        "speedup_compact_vs_batched": round(t_batched / t_compact, 2),
    })


if __name__ == "__main__":
    main()

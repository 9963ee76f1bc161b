"""On-chip parity check for the fused Pallas decode front-end.

Runs the fused path (real Mosaic kernels) and the dense XLA path on the SAME
random maps on the TPU and requires identical decode decisions (person
validity, joint coordinates) and fp-tolerance scores — the on-chip
counterpart of tests/test_fused_decode.py (which runs interpret mode on CPU;
Mosaic can diverge from interpret mode, CLAUDE.md).

Usage: python scripts/check_fused_tpu.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from human_pose_tpu.ops.decode import decode_batch_fused
from human_pose_tpu.ops.grouping import parse_batch
from human_pose_tpu.ops.heatmaps import average_stages, resize_bilinear


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    B, K, E, H4, W4 = 4, 17, 2, 128, 128
    H, W = 4 * H4, 4 * W4
    rs = np.random.RandomState(0)
    q_n = jnp.asarray(rs.rand(B, H4, W4, K).astype(np.float32))
    h_n = jnp.asarray(rs.rand(B, 2 * H4, 2 * W4, K).astype(np.float32))
    t_n = [jnp.asarray(rs.rand(B, H4, W4, K).astype(np.float32) * 4)
           for _ in range(E)]

    # dense path, built explicitly so the fused gate can't reroute it
    stages_khw = [jnp.transpose(x, (0, 3, 1, 2)) for x in (q_n, h_n)]
    kpts = resize_bilinear(
        average_stages(stages_khw, channel_major=True), H, W, channel_major=True
    )
    tags = jnp.stack(
        [resize_bilinear(jnp.transpose(t, (0, 3, 1, 2)), H, W, channel_major=True)
         for t in t_n],
        axis=-1,
    )
    dense = parse_batch(kpts, tags, max_num_people=30, det_thr=0.3, tag_thr=1.0)

    fused = decode_batch_fused(
        [q_n, h_n], t_n, input_hw=(H, W), max_num_people=30,
        det_thr=0.3, tag_thr=1.0, do_adjust=True, do_refine=True,
    )

    np.testing.assert_array_equal(np.asarray(dense[2]), np.asarray(fused[2]))
    np.testing.assert_array_equal(
        np.asarray(dense[0][..., :2]), np.asarray(fused[0][..., :2])
    )
    np.testing.assert_allclose(
        np.asarray(dense[1]), np.asarray(fused[1]), atol=5e-7, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(dense[0][..., 2:]), np.asarray(fused[0][..., 2:]),
        atol=1e-6, rtol=0,
    )
    n_persons = int(np.asarray(dense[2]).sum())
    print(f"fused-vs-dense on-chip parity OK ({n_persons} persons across {B} images)")


if __name__ == "__main__":
    main()

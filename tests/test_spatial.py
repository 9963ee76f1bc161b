"""Spatial partitioning (2-D data x space mesh) — parallel/spatial.py.

The reference has exactly one parallelism strategy (data-parallel DDP,
/root/reference/src/base/bin/train.py:16-27). Spatial partitioning is a
TPU-native extra: XLA's SPMD partitioner shards the H dim of NHWC conv
activations with automatic halo exchange. These tests pin

* exact forward parity of the plain (s2d=False) layout under a (data, space)
  mesh vs the single-device program,
* forward parity of the s2d packed layout under the same mesh (the
  reshape-transpose lowering of this layout used to MISCOMPILE here — the
  strided-slice lowering in models/s2d.py is the fix; see parallel/spatial.py),
* training-step loss parity under spatial sharding vs pure data sharding
  (both layouts), and
* batch-placement rules (joints/labels never shard over space).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.models import HigherHRNet
from human_pose_tpu.parallel import make_mesh, replicate, shard_batch
from human_pose_tpu.parallel.spatial import (
    SPACE_AXIS,
    make_mesh_2d,
    shard_batch_spatial,
    spatial_sharding,
)

TINY = dict(
    num_kpts=17, C=8, num_blocks_per_stage=(1, 1, 1, 1), num_units=1,
    num_deconv_resid_blocks=1,
)


def _tiny_batch(n=8, size=64, k=17, p=30):
    rs = np.random.RandomState(0)
    return {
        "images": rs.rand(n, size, size, 3).astype(np.float32),
        "heatmaps": [
            rs.rand(n, size // 4, size // 4, k).astype(np.float32),
            rs.rand(n, size // 2, size // 2, k).astype(np.float32),
        ],
        "masks": [
            np.ones((n, size // 4, size // 4), np.float32),
            np.ones((n, size // 2, size // 2), np.float32),
        ],
        "joints": np.stack(
            [
                np.stack(
                    [
                        rs.randint(0, size // 4, (p, k)),
                        rs.randint(0, size // 4, (p, k)),
                        (rs.rand(p, k) > 0.5).astype(np.int64),
                    ],
                    axis=-1,
                )
                for _ in range(n)
            ]
        ).astype(np.int32),
    }


def test_make_mesh_2d():
    mesh = make_mesh_2d(4, 2)
    assert mesh.shape == {"data": 4, SPACE_AXIS: 2}
    with pytest.raises(ValueError, match="devices"):
        make_mesh_2d(8, 2)  # 16 > 8 available: no silent truncation


def test_shard_batch_spatial_placement():
    """Images/heatmaps/masks shard (data, space); joints shard data-only
    (their dim 1 is persons, not rows)."""
    mesh = make_mesh_2d(4, 2)
    batch = shard_batch_spatial(mesh, _tiny_batch())
    assert batch["images"].sharding.spec == (  # type: ignore[union-attr]
        "data", SPACE_AXIS)
    assert batch["heatmaps"][1].sharding.spec == ("data", SPACE_AXIS)
    assert batch["masks"][0].sharding.spec == ("data", SPACE_AXIS)
    assert tuple(batch["joints"].sharding.spec) == ("data",)
    np.testing.assert_array_equal(
        np.asarray(batch["joints"]), _tiny_batch()["joints"]
    )


@pytest.mark.parametrize("s2d", [False, True], ids=["plain", "s2d"])
def test_forward_parity_spatial_vs_single_device(s2d):
    """HigherHRNet forward under a 4x2 (data, space) mesh matches the
    unsharded program — GSPMD inserts the 3x3 / stride-2 halo exchanges and
    the BN/global reductions itself, with no model changes. The s2d case
    exercises the strided-slice pack/unpack lowering (the reshape-transpose
    form returned max|err| ~1.9 here on jax 0.9.0 — parallel/spatial.py)."""
    model = HigherHRNet(s2d=s2d, **TINY)
    x = _tiny_batch()["images"]
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), train=False)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    ref = [np.asarray(o) for o in jax.tree_util.tree_leaves(jax.jit(fwd)(variables, x))]

    mesh = make_mesh_2d(4, 2)
    xs = jax.device_put(x, spatial_sharding(mesh))
    vs = replicate(mesh, variables)
    out = [np.asarray(o) for o in jax.tree_util.tree_leaves(jax.jit(fwd)(vs, xs))]

    assert len(ref) == len(out) >= 2
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o, r, rtol=0, atol=1e-5)


@pytest.mark.parametrize("s2d", [False, True], ids=["plain", "s2d"])
def test_train_step_spatial_matches_data_parallel(s2d):
    """One keypoints training step on the 4x2 mesh with a spatially-sharded
    batch produces the same loss/metrics as the same step under pure 8-way
    data sharding (both reduce over the same global batch) — in both compute
    layouts (the s2d case covers gradients + BN moment reductions through the
    strided-slice pack/unpack under H sharding)."""
    from human_pose_tpu.train import (
        TrainState, create_optimizer, keypoints_train_step,
    )

    model = HigherHRNet(s2d=s2d, **TINY)
    batch = _tiny_batch()
    # keep the init tree on host: the train step donates its state, and a
    # replicated device_put can alias the original device-0 buffer — the
    # second run would then see deleted arrays
    variables = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False),
    )

    def run(mesh, place):
        tx = create_optimizer("Adam", lr=1e-3)
        state = TrainState.create(
            model.apply, variables["params"], variables["batch_stats"], tx
        )
        state = replicate(mesh, state)
        state, metrics = keypoints_train_step(state, place(mesh, batch), 1e-3)
        return {k: float(v) for k, v in metrics.items()}

    m_dp = run(make_mesh(8), shard_batch)
    m_sp = run(make_mesh_2d(4, 2), shard_batch_spatial)
    assert m_dp.keys() == m_sp.keys()
    for k in m_dp:
        np.testing.assert_allclose(m_sp[k], m_dp[k], rtol=1e-5, err_msg=k)



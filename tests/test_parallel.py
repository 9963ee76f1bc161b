"""Parallel layer: mesh helpers, LocalBatchNorm group semantics, barrier."""

import jax
import jax.numpy as jnp
import numpy as np

from human_pose_tpu.parallel import (
    LocalBatchNorm,
    barrier,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_and_sharding():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = shard_batch(mesh, {"x": x})["x"]
    np.testing.assert_array_equal(np.asarray(xs), x)
    assert xs.sharding.spec[0] == "data"
    r = replicate(mesh, jnp.ones(3))
    assert r.sharding.is_fully_replicated
    barrier()


def test_local_batchnorm_groups():
    """num_groups=G normalizes each batch shard with its own moments —
    per-device statistics (the reference's non-synced BN default)."""
    rng = np.random.RandomState(0)
    # two groups with very different statistics
    g1 = rng.randn(4, 4, 4, 3).astype(np.float32) * 1.0
    g2 = rng.randn(4, 4, 4, 3).astype(np.float32) * 10.0 + 5.0
    x = jnp.asarray(np.concatenate([g1, g2]))

    bn = LocalBatchNorm(num_groups=2)
    v = bn.init(jax.random.PRNGKey(0), x, train=True)
    y, mutated = bn.apply(v, x, train=True, mutable=["batch_stats"])
    y = np.asarray(y)
    # each group is standardized independently
    for sl in (slice(0, 4), slice(4, 8)):
        assert abs(y[sl].mean()) < 1e-4
        assert abs(y[sl].std() - 1.0) < 1e-2

    # global BN (1 group) would NOT standardize each half
    bn1 = LocalBatchNorm(num_groups=1)
    v1 = bn1.init(jax.random.PRNGKey(0), x, train=True)
    y1, _ = bn1.apply(v1, x, train=True, mutable=["batch_stats"])
    y1 = np.asarray(y1)
    assert abs(y1[:4].std() - 1.0) > 0.5  # first half squashed by global var

    # eval mode uses running stats
    y_eval = bn.apply(
        {"params": v["params"], "batch_stats": mutated["batch_stats"]}, x, train=False
    )
    assert np.isfinite(np.asarray(y_eval)).all()


def test_hungarian_partial_rows():
    from human_pose_tpu.ops.hungarian import hungarian

    cost = jnp.asarray(
        np.array(
            [[1.0, 9.0, 9.0], [9.0, 1.0, 9.0], [5.0, 5.0, 5.0]], np.float32
        )
    )
    col = np.asarray(hungarian(cost, num_valid_rows=jnp.int32(2)))
    assert col[0] == 0 and col[1] == 1
    assert col[2] == -1  # row beyond num_valid_rows unassigned


def test_bn_groups_wiring_on_mesh():
    """trainer.sync_batchnorm plumbing (reference src/base/model.py:42-44):
    default = per-device BN moments (bn_groups = mesh size), flag=True =
    global-batch moments (bn_groups=1). Verified through a jitted ConvBN on
    the 8-device mesh with per-shard-distinct statistics."""
    from human_pose_tpu.models.hrnet import ConvBN

    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    # each device's shard (2 samples) has a distinct mean/scale
    shards = [
        rng.randn(2, 4, 4, 3).astype(np.float32) * (i + 1) + 3.0 * i
        for i in range(8)
    ]
    x = shard_batch(mesh, np.concatenate(shards))

    def run(bn_groups):
        m = ConvBN(3, kernel=1, bn_groups=bn_groups)
        v = m.init(jax.random.PRNGKey(0), np.zeros((1, 4, 4, 3), np.float32), train=False)

        @jax.jit
        def fwd(v, x):
            return m.apply(v, x, train=True, mutable=["batch_stats"])[0]

        return np.asarray(fwd(v, x))

    y_local = run(8)  # reference default: per-device stats
    for i in range(8):
        sl = slice(2 * i, 2 * i + 2)
        assert abs(y_local[sl].mean()) < 1e-3, f"shard {i} not locally normalized"
        assert abs(y_local[sl].std() - 1.0) < 2e-2

    y_sync = run(1)  # sync_batchnorm=true: global moments
    assert abs(y_sync.mean()) < 1e-3
    # global stats only center the WHOLE batch: the per-shard offsets (3*i)
    # survive as nonzero per-shard means, unlike the per-device variant above
    shard_means = [abs(y_sync[2 * i : 2 * i + 2].mean()) for i in range(8)]
    assert max(shard_means) > 0.1, shard_means


def test_sync_batchnorm_config_plumbing():
    """BaseConfig.bn_groups(): flag -> 1 group; default -> mesh size."""
    from human_pose_tpu.configs.keypoints import KeypointsConfig

    mesh = make_mesh(8)
    cfg = KeypointsConfig()
    cfg.__post_init_config__()
    assert cfg.bn_groups(mesh) == 8  # reference default: per-device stats
    net = cfg.create_net(bn_groups=cfg.bn_groups(mesh))
    assert net.bn_groups == 8

    cfg.trainer.sync_batchnorm = True
    assert cfg.bn_groups(mesh) == 1
    net = cfg.create_net(bn_groups=cfg.bn_groups(mesh))
    assert net.bn_groups == 1

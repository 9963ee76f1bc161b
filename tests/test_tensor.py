"""Tensor (channel) parallelism — parallel/tensor.py.

Pins the shape-based sharding rule, dp x tp train-step loss parity vs pure
data parallel (with the s2d packed layout ON — it is exact under tensor
sharding, unlike under spatial sharding), and the full 3-D dp x sp x tp mesh
(plain layout; spatial quarantines s2d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from human_pose_tpu.models import HigherHRNet
from human_pose_tpu.parallel import (
    TENSOR_AXIS,
    make_mesh,
    make_mesh_3d,
    replicate,
    shard_batch,
    shard_state_tensor,
    tensor_spec,
)
from human_pose_tpu.parallel.spatial import shard_batch_spatial
from human_pose_tpu.train import TrainState, create_optimizer, keypoints_train_step

from .test_spatial import TINY, _tiny_batch


def test_tensor_spec_rule():
    assert tensor_spec(np.zeros((3, 3, 8, 16)), 2) == P(None, None, None, TENSOR_AXIS)
    assert tensor_spec(np.zeros((1, 1, 32, 17)), 2) == P()  # 17 not divisible
    assert tensor_spec(np.zeros(16), 2) == P(TENSOR_AXIS)  # BN scale/bias
    assert tensor_spec(np.zeros(17), 2) == P()
    assert tensor_spec(np.float32(0.0), 2) == P()  # step counter


def test_make_mesh_3d_no_truncation():
    mesh = make_mesh_3d(2, 2, 2)
    assert mesh.shape == {"data": 2, "space": 2, TENSOR_AXIS: 2}
    with pytest.raises(ValueError, match="devices"):
        make_mesh_3d(4, 2, 2)


def _metrics(model, mesh, place_batch, place_state, batch, variables):
    tx = create_optimizer("Adam", lr=1e-3)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    state = place_state(mesh, state)
    state, metrics = keypoints_train_step(state, place_batch(mesh, batch), 1e-3)
    return {k: float(v) for k, v in metrics.items()}


def test_train_step_tp_and_3d_match_data_parallel():
    """One training step under (a) a 4x1x2 dp x tp mesh with the s2d packed
    layout and (b) the full 2x2x2 dp x sp x tp mesh (plain layout) produces
    the same loss/metrics as pure 8-way data parallel — the collectives XLA
    inserts (channel all-gathers, halo exchanges, grad reductions) only
    reorder fp summation."""
    batch = _tiny_batch()

    def init_host(model):
        return jax.tree_util.tree_map(
            np.asarray,
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False),
        )

    model_s2d = HigherHRNet(s2d=True, **TINY)
    v_s2d = init_host(model_s2d)
    m_dp = _metrics(model_s2d, make_mesh(8), shard_batch, replicate, batch, v_s2d)

    m_tp = _metrics(
        model_s2d, make_mesh_3d(4, 1, 2), shard_batch_spatial, shard_state_tensor,
        batch, v_s2d,
    )
    assert m_dp.keys() == m_tp.keys()
    for k in m_dp:
        np.testing.assert_allclose(m_tp[k], m_dp[k], rtol=1e-5, err_msg=f"tp:{k}")

    model_plain = HigherHRNet(s2d=False, **TINY)
    m_3d = _metrics(
        model_plain, make_mesh_3d(2, 2, 2), shard_batch_spatial, shard_state_tensor,
        batch, init_host(model_plain),
    )
    # identical math, different summation order AND a different (plain)
    # compute layout than the s2d baseline — same rtol still holds
    for k in m_dp:
        np.testing.assert_allclose(m_3d[k], m_dp[k], rtol=1e-5, err_msg=f"3d:{k}")


def test_opt_state_is_sharded():
    """The memory claim: params and Adam moments store 1/t per chip — every
    divisible leaf's committed shard shape has last dim C/t."""
    model = HigherHRNet(s2d=False, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    tx = create_optimizer("Adam", lr=1e-3)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    mesh = make_mesh_3d(4, 1, 2)
    state = shard_state_tensor(mesh, state)

    def shard_dim(x):
        return x.sharding.shard_shape(x.shape)[-1] if np.ndim(x) else None

    # a divisible conv kernel in params AND its Adam mu moment both shard 2x
    leaves = [
        x for x in jax.tree_util.tree_leaves(state)
        if np.ndim(x) == 4 and x.shape[-1] % 2 == 0
    ]
    assert leaves, "no divisible conv kernels found"
    assert all(shard_dim(x) == x.shape[-1] // 2 for x in leaves)


def test_checkpoint_roundtrip_under_tensor_sharding(tmp_path):
    """ZeRO-sharded training must checkpoint like replicated training: saving
    a tensor-sharded TrainState gathers full arrays (flax backend), and the
    restored host tree equals the original parameters bit-for-bit."""
    from human_pose_tpu.train.checkpoint import load_train_state, save_checkpoint
    from human_pose_tpu.train.checkpoint import load_checkpoint

    model = HigherHRNet(s2d=False, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    host_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tx = create_optimizer("Adam", lr=1e-3)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    state = shard_state_tensor(make_mesh_3d(4, 1, 2), state)

    path = tmp_path / "ckpt.pt"
    save_checkpoint(path, state, epoch=3)
    assert load_checkpoint(path)["epoch"] == 3

    fresh = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    restored = load_train_state(fresh, load_checkpoint(path))
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(host_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_orbax_checkpoint_roundtrip_under_tensor_sharding(tmp_path):
    """The orbax backend (multi-host sharded save) round-trips a
    tensor-sharded TrainState: each leaf saves from its shards and restores
    equal to the original host values."""
    from human_pose_tpu.train import checkpoint_orbax as co

    model = HigherHRNet(s2d=False, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    host_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    tx = create_optimizer("Adam", lr=1e-3)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    state = shard_state_tensor(make_mesh_3d(2, 1, 4), state)

    path = tmp_path / "ckpt_orbax"
    co.save_checkpoint(
        path, state, epoch=1, datamodule_state=None, metrics_state=None,
        callbacks_state=None, logger_state=None,
    )
    assert co.is_orbax_checkpoint(path)

    fresh = TrainState.create(
        model.apply,
        jax.tree_util.tree_map(jnp.zeros_like, variables["params"]),
        variables["batch_stats"], tx,
    )
    restored = co.load_train_state(fresh, co.load_checkpoint(path))
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(host_params),
    ):
        np.testing.assert_allclose(np.asarray(a), b, atol=0)

"""Train-step behavior: losses decrease, metrics computed, and the
data-parallel path over the virtual 8-device mesh matches single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.models import ClassificationHRNet, HigherHRNet
from human_pose_tpu.parallel import make_mesh, replicate, shard_batch
from human_pose_tpu.train import (
    TrainState,
    classification_train_step,
    classification_val_step,
    create_lr_scheduler,
    create_optimizer,
    keypoints_train_step,
    keypoints_val_step,
)

TINY = dict(num_blocks_per_stage=(1, 1, 1, 1), num_units=1)


def make_cls_state(rng, num_classes=13):
    model = ClassificationHRNet(C=8, num_classes=num_classes, **TINY)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(rng, x, train=False)
    tx = create_optimizer("SGD", lr=0.05, momentum=0.9)
    return TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )


def test_classification_step_decreases_loss():
    rng = jax.random.PRNGKey(0)
    state = make_cls_state(rng)
    images = jax.random.normal(rng, (8, 32, 32, 3))
    labels = jnp.arange(8) % 13
    losses = []
    for i in range(5):
        state, metrics = classification_train_step(state, images, labels, 0.05)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    val_metrics, logits = classification_val_step(state, images, labels)
    assert logits.shape == (8, 13)
    assert 0.0 <= float(val_metrics["top-5_error"]) <= 1.0


def make_kpts_batch(rng_np, n=4, size=64, k=17, p=5):
    return {
        "images": jnp.asarray(rng_np.rand(n, size, size, 3).astype(np.float32)),
        "heatmaps": [
            jnp.asarray(rng_np.rand(n, size // 4, size // 4, k).astype(np.float32)),
            jnp.asarray(rng_np.rand(n, size // 2, size // 2, k).astype(np.float32)),
        ],
        "masks": [
            jnp.ones((n, size // 4, size // 4), jnp.float32),
            jnp.ones((n, size // 2, size // 2), jnp.float32),
        ],
        "joints": jnp.asarray(
            np.stack(
                [
                    np.stack(
                        [
                            rng_np.randint(0, size // 4, (p, k)),
                            rng_np.randint(0, size // 4, (p, k)),
                            (rng_np.rand(p, k) > 0.5).astype(np.int64),
                        ],
                        axis=-1,
                    )
                    for _ in range(n)
                ]
            ).astype(np.int32)
        ),
    }


def test_keypoints_step_decreases_loss():
    rng = jax.random.PRNGKey(1)
    model = HigherHRNet(num_kpts=17, C=8, num_deconv_resid_blocks=1, **TINY)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(rng, x, train=False)
    tx = create_optimizer("Adam", lr=1e-3)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    batch = make_kpts_batch(np.random.RandomState(0))
    losses = []
    for _ in range(4):
        state, metrics = keypoints_train_step(state, batch, 1e-3)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    for key in ("hm_0", "hm_1", "push", "pull"):
        assert key in metrics
    val_metrics, out = keypoints_val_step(state, batch)
    assert out[0][0].shape == (4, 16, 16, 17)


def test_data_parallel_matches_single_device():
    """Same batch, sharded over the 8-device mesh vs single device: metrics
    (global means) must agree; params stay replicated and identical."""
    assert jax.device_count() >= 8
    rng = jax.random.PRNGKey(2)
    state = make_cls_state(rng)
    images = jax.random.normal(rng, (16, 32, 32, 3))
    labels = jnp.arange(16) % 13

    # single device
    s1, m1 = classification_train_step(state, images, labels, 0.05)

    # 8-device data parallel
    mesh = make_mesh(8)
    state8 = replicate(mesh, make_cls_state(rng))
    im8 = shard_batch(mesh, images)
    lb8 = shard_batch(mesh, labels)
    s8, m8 = classification_train_step(state8, im8, lb8, 0.05)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    # fp32 reduction order differs between the sharded (psum-of-partials) and
    # single-device execution; agreement is to ~1e-4 after one SGD step
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_lr_schedulers():
    s = create_lr_scheduler(0.1, "MultiStepLR", milestones=[2, 4], gamma=0.1)
    lrs = [s.lr]
    for _ in range(5):
        lrs.append(s.step())
    assert np.allclose(lrs, [0.1, 0.1, 0.01, 0.01, 0.001, 0.001])

    c = create_lr_scheduler(1.0, "CosineAnnealingLR", T_max=10)
    assert abs(c.get_lr(0) - 1.0) < 1e-9
    assert abs(c.get_lr(10) - 0.0) < 1e-9
    assert abs(c.get_lr(5) - 0.5) < 1e-9

    r = create_lr_scheduler(1.0, "ReduceLROnPlateau", patience=1, factor=0.5)
    r.step(1.0)
    r.step(1.0)  # bad 1
    r.step(1.0)  # bad 2 -> reduce
    assert abs(r.lr - 0.5) < 1e-9


def test_keypoints_train_step_with_remat():
    """remat=True must produce the same loss and valid grads (activations
    recomputed on backward)."""
    import jax

    rng = jax.random.PRNGKey(3)
    from human_pose_tpu.models import HigherHRNet
    from human_pose_tpu.train import TrainState, create_optimizer
    from human_pose_tpu.train.steps import keypoints_train_step

    batch = make_kpts_batch(np.random.RandomState(1), n=2, size=64)
    losses = {}
    for remat in (False, True):
        model = HigherHRNet(num_kpts=17, C=8, num_deconv_resid_blocks=1,
                            remat=remat, **TINY)
        variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
        tx = create_optimizer("Adam", lr=1e-3)
        state = TrainState.create(model.apply, variables["params"],
                                  variables["batch_stats"], tx)
        state, metrics = keypoints_train_step(state, batch, 1e-3)
        losses[remat] = float(metrics["loss"])
    assert abs(losses[True] - losses[False]) < 1e-4


def test_batch_to_device_copies_committed_arrays():
    """The train steps donate batch buffers; batch_to_device must therefore
    never hand back the caller's own device buffer (a datamodule yielding
    cached device arrays reused across steps would otherwise hit
    deleted-buffer errors on TPU — donation is a no-op on the CPU backend, so
    the guard is asserted structurally here) (ADVICE r2 #4)."""
    from human_pose_tpu.train.module import BaseModule

    module = BaseModule(model=None, state=None, schedulers={}, mesh=None)
    dev = jnp.arange(6.0).reshape(2, 3)  # committed jax.Array
    host = np.ones((2, 2), np.float32)
    out = module.batch_to_device({"a": dev, "b": host})
    assert out["a"] is not dev
    assert out["a"].unsafe_buffer_pointer() != dev.unsafe_buffer_pointer()
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(dev))
    np.testing.assert_array_equal(np.asarray(out["b"]), host)

    # mesh path: sharded placement must also not alias the input buffer
    mesh = make_mesh(8)
    module_m = BaseModule(model=None, state=None, schedulers={}, mesh=mesh)
    dev8 = jnp.arange(16.0).reshape(8, 2)
    out_m = module_m.batch_to_device({"a": dev8})
    assert out_m["a"] is not dev8


def test_gradient_accumulation_matches_sequential_oracle():
    """accumulated_classification_train_step == python-loop oracle: grads
    averaged over microbatches, BN stats threaded sequentially, one update."""
    from human_pose_tpu.train import accumulated_classification_train_step
    from human_pose_tpu.train.steps import _classification_grads, _update

    rng = jax.random.PRNGKey(1)
    # the jitted steps DONATE state: use two identical, independently built
    # states (same rng -> same init) for the accumulated call and the oracle
    state0 = make_cls_state(rng)
    state_oracle = make_cls_state(rng)
    images = jax.random.normal(rng, (8, 32, 32, 3))
    labels = jnp.arange(8) % 13

    state_acc, metrics_acc = accumulated_classification_train_step(2)(
        state0, images, labels, 0.05
    )
    state0 = state_oracle

    # oracle: explicit python loop with the same semantics
    st = state0
    grads_sum = None
    stats = state0.batch_stats
    losses = []
    for j in range(2):
        sl = slice(4 * j, 4 * (j + 1))
        g, stats, m = jax.jit(_classification_grads)(
            st.replace(batch_stats=stats), images[sl], labels[sl]
        )
        losses.append(float(m["loss"]))
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, g
        )
    grads = jax.tree_util.tree_map(lambda x: x / 2.0, grads_sum)
    params, _ = _update(state0, grads, 0.05)

    np.testing.assert_allclose(
        float(metrics_acc["loss"]), np.mean(losses), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_acc.params), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_acc.batch_stats),
        jax.tree_util.tree_leaves(stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(state_acc.step) == 1


def test_gradient_accumulation_n1_equals_plain_step():
    from human_pose_tpu.train import accumulated_classification_train_step

    rng = jax.random.PRNGKey(2)
    state_a = make_cls_state(rng)
    state_b = make_cls_state(rng)  # steps donate state: independent copies
    images = jax.random.normal(rng, (4, 32, 32, 3))
    labels = jnp.arange(4) % 13
    s1, m1 = classification_train_step(state_a, images, labels, 0.05)
    s2, m2 = accumulated_classification_train_step(1)(state_b, images, labels, 0.05)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gradient_accumulation_keypoints_oracle():
    """Keypoints-task variant of the accumulation oracle: scan grads average
    + threaded BN stats + one update == explicit python loop."""
    from human_pose_tpu.train import accumulated_keypoints_train_step
    from human_pose_tpu.train.steps import _keypoints_grads, _update

    def make_state():
        model = HigherHRNet(num_kpts=17, C=8, num_deconv_resid_blocks=1, **TINY)
        variables = model.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)), train=False
        )
        tx = create_optimizer("Adam", lr=1e-3)
        return TrainState.create(
            model.apply, variables["params"], variables["batch_stats"], tx
        )

    batch = make_kpts_batch(np.random.RandomState(4), n=4)
    state_acc, metrics_acc = accumulated_keypoints_train_step(2)(
        make_state(), jax.tree_util.tree_map(jnp.copy, batch), 1e-3
    )

    state0 = make_state()
    stats = state0.batch_stats
    grads_sum = None
    losses = []
    for j in range(2):
        mb = jax.tree_util.tree_map(lambda x: x[2 * j : 2 * (j + 1)], batch)
        g, stats, m = jax.jit(_keypoints_grads)(
            state0.replace(batch_stats=stats), mb
        )
        losses.append(float(m["loss"]))
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, g
        )
    grads = jax.tree_util.tree_map(lambda x: x / 2.0, grads_sum)
    params, _ = _update(state0, grads, 1e-3)

    np.testing.assert_allclose(float(metrics_acc["loss"]), np.mean(losses), rtol=1e-5)
    # scan-fused vs python-loop grads differ by ~1e-8 fp summation noise,
    # and Adam's m/sqrt(v) is direction-unstable where grads are near zero —
    # compare at lr scale (one update moves a param by <= ~lr=1e-3). The
    # scale-SENSITIVE sum-vs-mean averaging check is the classification
    # oracle above (SGD+momentum, tight atol).
    for a, b in zip(
        jax.tree_util.tree_leaves(state_acc.params), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_clip_norm_optimizer_and_lr_injection():
    """create_optimizer(clip_norm=...) wraps the update in a global-norm clip
    and set_learning_rate still finds the injected lr inside the chain."""
    import jax.numpy as jnp
    import optax

    from human_pose_tpu.train.optim import create_optimizer, set_learning_rate

    params = {"w": jnp.ones((3,))}
    tx = create_optimizer("SGD", lr=1.0, clip_norm=0.5)
    st = tx.init(params)
    # a giant gradient gets clipped to global norm 0.5
    grads = {"w": jnp.full((3,), 100.0)}
    st = set_learning_rate(st, 1.0)
    updates, st = tx.update(grads, st, params)
    norm = float(jnp.sqrt(sum(jnp.sum(u ** 2) for u in jax.tree_util.tree_leaves(updates))))
    assert abs(norm - 0.5) < 1e-5, norm
    # lr injection scales the update
    st2 = set_learning_rate(st, 0.1)
    updates2, _ = tx.update(grads, st2, params)
    norm2 = float(jnp.sqrt(sum(jnp.sum(u ** 2) for u in jax.tree_util.tree_leaves(updates2))))
    assert abs(norm2 - 0.05) < 1e-6, norm2

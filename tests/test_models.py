"""Model shape + parameter-count parity tests.

Golden parameter counts were measured once from the reference torch models
(/root/reference/src/*/architectures/hrnet.py) with C=32:
  HRNetBackbone (multi-scale out):   29,305,536
  HigherHRNet(num_kpts=17):          28,645,331
  ClassificationHRNet(num_classes=1000): 41,232,680

Full-size (C=32) checks run through ``jax.eval_shape`` (shape-only tracing, no
XLA compile); numeric forwards use C=8 to keep CPU compiles fast.
"""

import jax
import jax.numpy as jnp
import pytest

from human_pose_tpu.models import (
    ClassificationHRNet,
    HigherHRNet,
    HRNetBackbone,
    HRNetSPPE,
    init_classification_weights,
    init_keypoints_weights,
)


def n_params(params):
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def hh8(rng):
    """C=8 HigherHRNet + variables, shared across numeric tests (one compile)."""
    model = HigherHRNet(num_kpts=17, C=8, num_blocks_per_stage=(1, 1, 1, 1), num_units=1, num_deconv_resid_blocks=1)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(rng, x, train=False)
    return model, variables


def test_backbone_multiscale_shapes_and_params(rng):
    model = HRNetBackbone(C=32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.eval_shape(lambda r: model.init(r, x, train=False), rng)
    outs = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables
    )
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32),
        (1, 8, 8, 64),
        (1, 4, 4, 128),
        (1, 2, 2, 256),
    ]
    assert n_params(variables["params"]) == 29_305_536


def test_higher_hrnet_shapes_and_params(rng):
    model = HigherHRNet(num_kpts=17, C=32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = jax.eval_shape(lambda r: model.init(r, x, train=False), rng)
    hms, tags = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables
    )
    assert hms[0].shape == (1, 32, 32, 17)
    assert hms[1].shape == (1, 64, 64, 17)
    assert tags.shape == (1, 32, 32, 17)
    assert hms[0].dtype == jnp.float32
    assert n_params(variables["params"]) == 28_645_331


def test_higher_hrnet_w48_params(rng):
    """The wider family member (experiments/keypoints/higher_hrnet_48.yaml):
    63.8M params, matching the published HigherHRNet-W48 size."""
    model = HigherHRNet(num_kpts=17, C=48)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.eval_shape(lambda r: model.init(r, x, train=False), rng)
    assert n_params(variables["params"]) == 63_827_139


def test_classification_hrnet_shapes_and_params(rng):
    model = ClassificationHRNet(C=32, num_classes=1000)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.eval_shape(lambda r: model.init(r, x, train=False), rng)
    logits = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables
    )
    assert logits.shape == (1, 1000)
    assert n_params(variables["params"]) == 41_232_680


def test_sppe_head_softmax(rng):
    model = HRNetSPPE(num_keypoints=17, C=8, num_blocks_per_stage=(1, 1, 1, 1), num_units=1)
    x = jax.random.normal(rng, (1, 64, 64, 3))
    variables = model.init(rng, x, train=False)
    hms = model.apply(variables, x, train=False)[0]
    assert hms.shape == (1, 16, 16, 17)
    # softmax over keypoint channel dim (reference hrnet.py:399)
    assert jnp.allclose(hms.sum(-1), 1.0, atol=1e-5)


def test_bf16_compute_fp32_outputs(rng, hh8):
    model = HigherHRNet(num_kpts=17, C=8, num_blocks_per_stage=(1, 1, 1, 1), num_units=1, num_deconv_resid_blocks=1, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    _, variables = hh8  # fp32 params drive bf16 compute
    hms, tags = model.apply(variables, x, train=False)
    assert hms[0].dtype == jnp.float32 and tags.dtype == jnp.float32
    # params stay fp32
    assert all(
        p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(variables["params"])
    )


def test_weight_init_schemes(rng, hh8):
    model, variables = hh8
    params = init_keypoints_weights(variables["params"], rng)
    kernels = [
        l for path, l in jax.tree_util.tree_flatten_with_path(params)[0]
        if l.ndim == 4
    ]
    flat = jnp.concatenate([k.ravel() for k in kernels])
    assert abs(float(flat.std()) - 0.001) < 2e-4

    params_c = init_classification_weights(variables["params"], rng)
    assert n_params(params_c) == n_params(variables["params"])


def test_batchnorm_train_updates_stats(rng, hh8):
    model, variables = hh8
    x = jax.random.normal(rng, (2, 64, 64, 3))
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(not jnp.allclose(a, b) for a, b in zip(before, after))
    assert changed


def test_s2d_head_exact_parity():
    """The space-to-depth compute layout (models/s2d.py: deconv head + the
    backbone's C<=32 branch chains) shares the plain modules' parameter tree
    and computes identical values (fp32, up to summation order) in eval AND
    train mode, including BN batch_stats updates."""
    import numpy as np

    from human_pose_tpu.models import HigherHRNet

    kw = dict(
        num_kpts=5, C=8, num_blocks_per_stage=(1, 1, 1, 1), num_units=1,
        num_deconv_resid_blocks=2, dtype=jnp.float32,
    )
    plain = HigherHRNet(s2d=False, **kw)
    packed = HigherHRNet(s2d=True, **kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    variables = plain.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
    v2 = packed.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)), train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(v2))
    )

    # eval mode
    (hms_p, tags_p) = plain.apply(variables, x, train=False)
    (hms_s, tags_s) = packed.apply(variables, x, train=False)
    for a, b in zip(hms_p, hms_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    np.testing.assert_allclose(np.asarray(tags_p), np.asarray(tags_s), atol=2e-4)

    # train mode: outputs and updated BN stats must match
    (hms_p, _), mut_p = plain.apply(variables, x, train=True, mutable=["batch_stats"])
    (hms_s, _), mut_s = packed.apply(variables, x, train=True, mutable=["batch_stats"])
    for a, b in zip(hms_p, hms_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(mut_p), jax.tree_util.tree_leaves(mut_s)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    # gradients flow through the kernel construction identically
    def loss(params, model):
        out, _ = model.apply(
            {**variables, "params": params}, x, train=True, mutable=["batch_stats"]
        )
        return sum(jnp.sum(h**2) for h in out[0])

    g_p = jax.grad(loss)(variables["params"], plain)
    g_s = jax.grad(loss)(variables["params"], packed)
    for a, b in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_s)):
        a, b = np.asarray(a), np.asarray(b)
        # fp32 summation-order noise through the reordered conv chains; in
        # float64 the same comparison lands at 3e-14 relative (verified once;
        # x64 is not flipped here to keep the suite's global config intact)
        assert np.max(np.abs(a - b)) <= 1e-2 * (np.max(np.abs(a)) + 1e-6)

"""Alternative architectures: Hourglass / AEHourglass / SimpleBaseline /
ResNet shapes (shape-only via eval_shape where heavy)."""

import jax
import jax.numpy as jnp

from human_pose_tpu.models import (
    AEHourglassNet,
    HourglassNet,
    ResNet,
    SEBlock,
    SimpleBaseline,
)


def shapes(model, x, rng=None):
    rng = rng or jax.random.PRNGKey(0)
    v = jax.eval_shape(lambda r: model.init(r, x, train=False), rng)
    return jax.eval_shape(lambda v: model.apply(v, x, train=False), v)


def test_ae_hourglass_shapes():
    model = AEHourglassNet(num_kpts=17, num_stages=2)
    x = jnp.zeros((1, 128, 128, 3))
    hms, tags = shapes(model, x)
    assert len(hms) == 2
    assert all(h.shape == (1, 32, 32, 17) for h in hms)
    assert tags.shape == (1, 32, 32, 17)


def test_hourglass_sppe_shapes():
    model = HourglassNet(num_kpts=16, num_stages=2)
    x = jnp.zeros((1, 128, 128, 3))
    hms = shapes(model, x)
    assert len(hms) == 2 and hms[0].shape == (1, 32, 32, 16)


def test_simple_baseline_shapes():
    model = SimpleBaseline(num_kpts=17, backbone="resnet18")
    x = jnp.zeros((1, 128, 128, 3))
    hms = shapes(model, x)
    assert hms[0].shape == (1, 32, 32, 17)


def test_resnet_variants_shapes():
    x = jnp.zeros((1, 64, 64, 3))
    for variant, out_ch in [("resnet18", 512), ("resnet50", 2048)]:
        model = ResNet(variant)
        feats = shapes(model, x)
        assert feats.shape == (1, 2, 2, out_ch)
    logits = shapes(ResNet("resnet18", num_classes=10), x)
    assert logits.shape == (1, 10)


def test_resnet50_param_count():
    # torchvision resnet50 has 25,557,032 params (fc included)
    model = ResNet("resnet50", num_classes=1000)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.eval_shape(lambda r: model.init(r, x, train=False), jax.random.PRNGKey(0))
    n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == 25_557_032


def test_se_block():
    se = SEBlock()
    x = jnp.ones((2, 4, 4, 32))
    v = se.init(jax.random.PRNGKey(0), x)
    y = se.apply(v, x)
    assert y.shape == x.shape

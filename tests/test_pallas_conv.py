"""Fused BasicBlock conv kernel parity (interpret mode) + BN folding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.ops.pallas_conv import (
    fold_conv_bn,
    fused_basic_block,
    reference_basic_block,
)


@pytest.mark.parametrize("shape", [(1, 16, 16, 8), (2, 32, 24, 16)])
def test_fused_block_matches_xla(shape):
    rng = np.random.RandomState(0)
    b, h, w, c = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    ours = fused_basic_block(x, w1, b1, w2, b2, interpret=True)
    ref = reference_basic_block(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_fold_conv_bn():
    rng = np.random.RandomState(1)
    c = 8
    x = jnp.asarray(rng.randn(1, 8, 8, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    mean = jnp.asarray(rng.randn(c).astype(np.float32))
    var = jnp.asarray(rng.rand(c).astype(np.float32) + 0.1)

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    conv = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)
    bn_out = (conv - mean) / jnp.sqrt(var + 1e-5) * scale + bias

    kf, bf = fold_conv_bn(k, scale, bias, mean, var)
    folded = jax.lax.conv_general_dilated(x, kf, (1, 1), "SAME", dimension_numbers=dn) + bf
    np.testing.assert_allclose(np.asarray(folded), np.asarray(bn_out), atol=1e-5)

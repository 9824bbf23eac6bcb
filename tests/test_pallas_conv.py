"""Fused Pallas conv3x3+BN+ReLU kernel vs XLA conv + BatchNorm oracle.

The kernel replaces the UNet decoder-tail convs in the bf16 rollout mode
(reference applies conv->BN->ReLU throughout, `unet_encoder.py:6-11`);
the fp32 parity path keeps XLA's conv. On CPU the kernel runs in
interpreter mode — these tests check the math, not the speed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from ws_mgmap_tpu.models.layers import ConvBNReLU
from ws_mgmap_tpu.ops.pallas import conv as pconv


def _conv_ref(x, w, scale, bias, relu):
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * scale + bias
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("shape", [
    (2, 16, 24, 8, 16),   # multi-tile rows (bh=16 -> 1 tile)
    (1, 32, 20, 5, 7),    # ragged channels, 2 tiles
    (2, 8, 8, 3, 4),      # minimum spatial extent
    (1, 56, 12, 6, 10),   # bh=8 -> 7 tiles (56^2 decoder shape class)
])
@pytest.mark.parametrize("relu", [True, False])
def test_conv3x3_matches_xla(shape, relu):
    b, h, w, ci, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, ci).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, ci, co) * 0.1).astype(np.float32))
    s = jnp.asarray((rng.rand(co) + 0.5).astype(np.float32))
    bb = jnp.asarray((rng.randn(co) * 0.1).astype(np.float32))
    ref = _conv_ref(x, k, s, bb, relu)
    got = pconv.conv3x3_bn_relu(x, k, s, bb, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_bn_matches_batchnorm():
    rng = np.random.RandomState(1)
    ci, co = 6, 12
    x = jnp.asarray(rng.randn(2, 16, 16, ci).astype(np.float32))
    m = ConvBNReLU(ci, co, 3, 1)
    variables = m.init(jax.random.PRNGKey(0), x, True)
    # non-trivial running stats
    variables = jax.tree.map(
        lambda a: a + 0.3 if a.ndim == 1 else a, variables)
    ref = m.apply(variables, x, False)
    pconv.set_fused_conv_mode("on")
    try:
        got = m.apply(variables, x, False)
    finally:
        pconv.set_fused_conv_mode("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mode_gate():
    # auto-mode on CPU must stay on the exact XLA path
    assert not pconv.fused_conv_active((1, 224, 224, 64), jnp.bfloat16, 3, 1)
    pconv.set_fused_conv_mode("off")
    try:
        assert not pconv.fused_conv_active((1, 224, 224, 64), jnp.float32, 3, 1)
    finally:
        pconv.set_fused_conv_mode("auto")
    # ineligible geometries never fuse
    assert not pconv.fused_conv_eligible((1, 224, 224, 64), 3, 2)
    assert not pconv.fused_conv_eligible((1, 224, 224, 64), 1, 1)
    assert not pconv.fused_conv_eligible((1, 4, 224, 64), 3, 1)


@pytest.mark.parametrize("shape", [
    (2, 16, 24, 8, 4, 16),   # single tile
    (1, 32, 20, 6, 10, 7),   # 2 tiles, ragged channels
])
@pytest.mark.parametrize("impl", ["im2col", "tap"])
def test_conv3x3_two_input_concat(shape, impl):
    """x2 streaming == conv over the materialized channel concat."""
    b, h, w, c1, c2, co = shape
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, h, w, c1).astype(np.float32))
    x2 = jnp.asarray(rng.randn(b, h, w, c2).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, c1 + c2, co) * 0.1).astype(np.float32))
    s = jnp.asarray((rng.rand(co) + 0.5).astype(np.float32))
    bb = jnp.asarray((rng.randn(co) * 0.1).astype(np.float32))
    ref = _conv_ref(jnp.concatenate([x, x2], axis=-1), k, s, bb, True)
    got = pconv.conv3x3_bn_relu(x, k, s, bb, relu=True, bh=16, impl=impl,
                                x2=x2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

"""Parity tests for pooling/interpolation ops vs torch."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ws_mgmap_tpu.ops import pooling

RNG = np.random.RandomState(3)


def test_adaptive_max_pool_lastdim():
    x = RNG.randn(2, 7, 96).astype(np.float32)
    for out in (96, 64, 10):
        got = np.asarray(pooling.adaptive_max_pool_lastdim(jnp.asarray(x), out))
        want = F.adaptive_max_pool1d(torch.from_numpy(x), out).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_adaptive_avg_pool_lastdim():
    x = RNG.randn(2, 5, 49).astype(np.float32)
    for out in (1, 7):
        got = np.asarray(pooling.adaptive_avg_pool_lastdim(jnp.asarray(x), out))
        want = F.adaptive_avg_pool1d(torch.from_numpy(x), out).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_avg_pool2d():
    x = RNG.randn(2, 27, 48, 48).astype(np.float32)
    got = np.asarray(
        pooling.avg_pool2d_nhwc(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 2, 2)
    )
    want = F.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-5)


def test_interpolate_nearest():
    x = RNG.randn(2, 1, 100, 100).astype(np.float32)
    got = np.asarray(
        pooling.interpolate_nearest_nhwc(
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))), (48, 48)
        )
    )
    want = F.interpolate(torch.from_numpy(x), size=(48, 48), mode="nearest").numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-6)


def test_interpolate_area():
    x = RNG.randn(2, 1, 100, 100).astype(np.float32)
    got = np.asarray(
        pooling.interpolate_area_nhwc(
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))), (24, 24)
        )
    )
    want = F.interpolate(torch.from_numpy(x), size=(24, 24), mode="area").numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-5)


def test_upsample_bilinear_x2():
    x = RNG.randn(2, 4, 7, 9).astype(np.float32)
    got = np.asarray(
        pooling.upsample_bilinear_x2_nhwc(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    )
    want = F.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-5)

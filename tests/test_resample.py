"""Parity tests: ops/resample vs torch F.affine_grid / F.grid_sample."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ws_mgmap_tpu.ops import resample

RNG = np.random.RandomState(0)


def rand_img(n=2, c=3, h=17, w=23):
    return RNG.randn(n, c, h, w).astype(np.float32)


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [False, True])
def test_affine_grid_parity(align_corners):
    theta = RNG.randn(3, 2, 3).astype(np.float32)
    got = np.asarray(resample.affine_grid(jnp.asarray(theta), 11, 13, align_corners))
    want = F.affine_grid(
        torch.from_numpy(theta), (3, 1, 11, 13), align_corners=align_corners
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_parity(mode, align_corners):
    img = rand_img()
    # grid with plenty of out-of-bounds coordinates
    grid = (RNG.rand(2, 9, 11, 2).astype(np.float32) * 3.0) - 1.5
    want = F.grid_sample(
        torch.from_numpy(img),
        torch.from_numpy(grid),
        mode=mode,
        padding_mode="zeros",
        align_corners=align_corners,
    ).numpy()
    got = np.asarray(
        resample.grid_sample(jnp.asarray(to_nhwc(img)), jnp.asarray(grid), mode, align_corners)
    )
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-5, rtol=1e-5)


def test_rotate_about_center_matches_reference_chain():
    """RotateTensor (reference rgb_mapping.py:235-250) parity."""
    img = rand_img(n=4, c=8, h=32, w=32)
    heading = RNG.uniform(-np.pi, np.pi, size=(4, 1)).astype(np.float32)

    t = torch.from_numpy(img)
    sin_t = torch.sin(torch.from_numpy(heading).squeeze(1))
    cos_t = torch.cos(torch.from_numpy(heading).squeeze(1))
    a = torch.zeros(4, 2, 3)
    a[:, 0, 0] = cos_t
    a[:, 0, 1] = sin_t
    a[:, 1, 0] = -sin_t
    a[:, 1, 1] = cos_t
    grid = F.affine_grid(a, t.size(), align_corners=False)
    want = F.grid_sample(t, grid, align_corners=False).numpy()

    got = np.asarray(
        resample.rotate_about_center(jnp.asarray(to_nhwc(img)), jnp.asarray(heading.ravel()))
    )
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-4, rtol=1e-4)


def test_translate_norm_matches_get_grid_chain():
    """get_grid theta2 translation (reference rgb_mapping.py:106-139) parity."""
    img = rand_img(n=3, c=5, h=24, w=24)
    pose = RNG.uniform(-0.8, 0.8, size=(3, 2)).astype(np.float32)

    t = torch.from_numpy(img)
    x = torch.from_numpy(pose[:, 0])
    y = torch.from_numpy(pose[:, 1])
    theta2 = torch.zeros(3, 2, 3)
    theta2[:, 0, 0] = 1
    theta2[:, 0, 2] = x
    theta2[:, 1, 1] = 1
    theta2[:, 1, 2] = y
    grid = F.affine_grid(theta2, t.size(), align_corners=False)
    want = F.grid_sample(t, grid, align_corners=False).numpy()

    got = np.asarray(
        resample.translate_norm(
            jnp.asarray(to_nhwc(img)), jnp.asarray(pose[:, 0]), jnp.asarray(pose[:, 1])
        )
    )
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-5, rtol=1e-5)


def test_translate_fast_matches_gather():
    """Stencil fast path == gather path (both torch-parity)."""
    import jax.numpy as jnp
    img = rand_img(n=4, c=6, h=30, w=26)
    pose = RNG.uniform(-1.2, 1.2, size=(4, 2)).astype(np.float32)
    ref = np.asarray(resample.translate_norm(
        jnp.asarray(to_nhwc(img)), jnp.asarray(pose[:, 0]), jnp.asarray(pose[:, 1])))
    fast = np.asarray(resample.translate_norm_fast(
        jnp.asarray(to_nhwc(img)), jnp.asarray(pose[:, 0]), jnp.asarray(pose[:, 1])))
    np.testing.assert_allclose(fast, ref, atol=2e-4, rtol=1e-4)


def test_translate_fast_integer_and_edge_shifts():
    import jax.numpy as jnp
    img = rand_img(n=3, c=2, h=16, w=16)
    # exact integer shifts, zero shift, and a shift pushing fully out
    tx = np.array([0.0, 4 / 8.0, 2.5], np.float32)   # 0, +4px, fully out
    ty = np.array([0.0, -2 / 8.0, 0.0], np.float32)  # 0, -2px
    ref = np.asarray(resample.translate_norm(
        jnp.asarray(to_nhwc(img)), jnp.asarray(tx), jnp.asarray(ty)))
    fast = np.asarray(resample.translate_norm_fast(
        jnp.asarray(to_nhwc(img)), jnp.asarray(tx), jnp.asarray(ty)))
    np.testing.assert_allclose(fast, ref, atol=2e-4)
    assert np.all(fast[2] == 0.0)  # fully out of range -> zeros


def test_grid_sample_patch_impl_bitwise_equal():
    """The one-gather 2x2-patch fetch (TPU hot path) must reproduce the
    four-tap gather bit-for-bit (same taps, same weights)."""
    img = rand_img()
    grid = (RNG.rand(2, 9, 11, 2).astype(np.float32) * 3.0) - 1.5
    a = np.asarray(resample.grid_sample(
        jnp.asarray(to_nhwc(img)), jnp.asarray(grid), impl="patch"))
    b = np.asarray(resample.grid_sample(
        jnp.asarray(to_nhwc(img)), jnp.asarray(grid), impl="taps"))
    np.testing.assert_array_equal(a, b)

"""Parity tests for pinhole projection + scatter-max splat.

The torch oracle below re-derives the reference math
(`vlnce_baselines/common/rgb_mapping.py:142-232`) with stock torch ops
(scatter_reduce amax replaces the CUDA torch_scatter.scatter_max).
"""
import numpy as np
import torch

import jax.numpy as jnp

from ws_mgmap_tpu.ops import projection

RNG = np.random.RandomState(1)
EGO = 20
SCALE = 0.12


def torch_spatial_locs(depth_nchw):
    _, _, imh, imw = depth_nchw.shape
    cx, cy = imh / 2.0, imw / 2.0
    fx = (imh / 2.0) / np.tan(np.deg2rad(45.0))
    fy = (imw / 2.0) / np.tan(np.deg2rad(45.0))
    x = torch.arange(0, imw).view(1, 1, 1, imw)
    y = torch.arange(imh, 0, step=-1).view(1, 1, imh, 1)
    xx = (x - cx) / fx
    yy = (y - cy) / fy
    Z = depth_nchw
    X = xx * Z
    Y = yy * Z
    valid = (Z != 0) & ((Y > -1.5) & (Y < 0.1))
    x_gp = ((X / SCALE) + (EGO - 1) / 2).round().long()
    y_gp = (-(Z / SCALE) + (EGO - 1) / 2).round().long()
    return torch.cat([x_gp, y_gp], dim=1), valid


def torch_splat(conv, spatial_locs, valid):
    eps = -1e16
    bs, f, HbyK, WbyK = conv.shape
    depth_h = spatial_locs.shape[-1]
    K = depth_h / WbyK
    idx_h = (torch.arange(0, HbyK) * K).long()
    idx_w = (torch.arange(0, WbyK) * K).long()
    sl = spatial_locs[:, :, idx_h[:, None], idx_w]
    va = valid[:, :, idx_h[:, None], idx_w].squeeze(1)
    inv_spatial = (sl[:, 1] >= EGO) | (sl[:, 1] < 0) | (sl[:, 0] >= EGO) | (sl[:, 0] < 0)
    invalid = inv_spatial | (~va)
    sl = sl.clone()
    sl[:, 0][invalid] = 0
    sl[:, 1][invalid] = 0
    conv_masked = conv * (1 - invalid[:, None].float()) + eps * invalid[:, None].float()
    conv_masked = conv_masked.reshape(bs, f, -1)
    lin = (sl[:, 1] * EGO + sl[:, 0]).reshape(bs, 1, -1).expand(-1, f, -1)
    out = torch.full((bs, f, EGO * EGO), -float("inf"))
    out = out.scatter_reduce(2, lin, conv_masked, reduce="amax", include_self=True)
    out = torch.where(out <= eps, torch.zeros_like(out), out)
    return out.reshape(bs, f, EGO, EGO)


def test_spatial_locs_parity():
    depth = (RNG.rand(2, 24, 24, 1) * 8).astype(np.float32)
    depth[0, :4] = 0.0  # zero-depth pixels must be invalid
    x_gp, y_gp, valid = projection.spatial_locs(jnp.asarray(depth), EGO, SCALE)

    t = torch.from_numpy(np.transpose(depth, (0, 3, 1, 2)))
    locs, tvalid = torch_spatial_locs(t)
    np.testing.assert_array_equal(np.asarray(x_gp), locs[:, 0].numpy())
    np.testing.assert_array_equal(np.asarray(y_gp), locs[:, 1].numpy())
    np.testing.assert_array_equal(np.asarray(valid), tvalid.squeeze(1).numpy())


def test_splat_parity_with_subsampling():
    # feature at 21x21, depth at 24x24 -> exercises the floor(i*K) subsample
    feats = RNG.randn(2, 21, 21, 5).astype(np.float32)
    depth = (RNG.rand(2, 24, 24, 1) * 8).astype(np.float32)
    depth[1, 10:] = 0.0

    x_gp, y_gp, valid = projection.spatial_locs(jnp.asarray(depth), EGO, SCALE)
    got = projection.splat_to_ground(jnp.asarray(feats), x_gp, y_gp, valid, EGO)

    t_depth = torch.from_numpy(np.transpose(depth, (0, 3, 1, 2)))
    locs, tvalid = torch_spatial_locs(t_depth)
    t_feats = torch.from_numpy(np.transpose(feats, (0, 3, 1, 2)))
    want = torch_splat(t_feats, locs, tvalid).numpy()

    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5, rtol=1e-5
    )


def test_splat_negative_features_preserved():
    """Valid negative features must survive (the eps trick, not a relu)."""
    feats = -np.abs(RNG.randn(1, 8, 8, 3).astype(np.float32)) - 0.5
    depth = np.full((1, 8, 8, 1), 1.0, np.float32)
    x_gp, y_gp, valid = projection.spatial_locs(jnp.asarray(depth), EGO, SCALE)
    out = np.asarray(projection.splat_to_ground(jnp.asarray(feats), x_gp, y_gp, valid, EGO))
    assert (out < 0).any(), "negative valid features should be written"


def test_project_egocentric_runs():
    feats = RNG.randn(2, 21, 21, 4).astype(np.float32)
    depth = (RNG.rand(2, 24, 24, 1) * 0.8).astype(np.float32)
    heading = RNG.uniform(-np.pi, np.pi, size=(2,)).astype(np.float32)
    out = projection.project_egocentric(
        jnp.asarray(feats), jnp.asarray(depth) * 10.0, jnp.asarray(heading),
        ego_size=EGO, local_scale=SCALE,
    )
    assert out.shape == (2, EGO, EGO, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_splat_backend_matches_xla():
    """The Pallas splat backend (interpret mode on CPU) must equal the
    segment_max path bit-for-bit."""
    feats = RNG.randn(2, 21, 21, 5).astype(np.float32)
    depth = (RNG.rand(2, 24, 24, 1) * 8).astype(np.float32)
    x_gp, y_gp, valid = projection.spatial_locs(jnp.asarray(depth), EGO, SCALE)
    a = projection.splat_to_ground(jnp.asarray(feats), x_gp, y_gp, valid, EGO,
                                   backend="xla")
    b = projection.splat_to_ground(jnp.asarray(feats), x_gp, y_gp, valid, EGO,
                                   backend="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pallas_splat_v4sub_dispatch_matches_xla():
    """B>8 dispatches to the sub-batched v4 kernel (lax.map over groups of
    <=6, `projection.py::_subgroup_size`); it must equal segment_max."""
    feats = RNG.randn(12, 21, 21, 5).astype(np.float32)
    depth = (RNG.rand(12, 24, 24, 1) * 8).astype(np.float32)
    x_gp, y_gp, valid = projection.spatial_locs(jnp.asarray(depth), EGO, SCALE)
    a = projection.splat_to_ground(jnp.asarray(feats), x_gp, y_gp, valid, EGO,
                                   backend="xla")
    b = projection.splat_to_ground(jnp.asarray(feats), x_gp, y_gp, valid, EGO,
                                   backend="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_subgroup_size():
    assert projection._subgroup_size(24) == 6
    assert projection._subgroup_size(12) == 6
    assert projection._subgroup_size(16) == 4
    assert projection._subgroup_size(10) == 5
    assert projection._subgroup_size(7) == 0  # prime >6 -> packed kernel


def test_rotate_in_splat_zero_angle_bitwise():
    """heading=0 must leave the coordinate math bitwise unchanged."""
    feats = RNG.randn(2, 21, 21, 4).astype(np.float32)
    depth = (RNG.rand(2, 24, 24, 1) * 8).astype(np.float32)
    zero = jnp.zeros((2,), jnp.float32)
    a = projection.project_egocentric(
        jnp.asarray(feats), jnp.asarray(depth), zero,
        ego_size=EGO, local_scale=SCALE)
    b = projection.project_egocentric(
        jnp.asarray(feats), jnp.asarray(depth), zero,
        ego_size=EGO, local_scale=SCALE, rotate_coords=True)
    # the reference chain still runs a (identity) bilinear warp that leaves
    # tiny resampling fuzz; the rotated-coords path has none
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_rotate_in_splat_matches_rotate_after():
    """Rotating coordinates before binning must land every feature within
    one cell of where splat-then-bilinear-rotate puts it (the half-cell
    rounding both paths inherently carry), across headings.

    Probe: single bright pixels -> compare peak cell locations."""
    ego = 64
    for angle in (-2.1, -0.7, 0.4, 1.3, 2.9):
        heading = jnp.full((1,), angle, jnp.float32)
        # one pixel at image center-ish with a distinctive value
        feats = np.zeros((1, 16, 16, 1), np.float32)
        feats[0, 8, 11, 0] = 7.0
        depth = np.full((1, 16, 16, 1), 2.5, np.float32)
        ref = projection.project_egocentric(
            jnp.asarray(feats), jnp.asarray(depth), heading,
            ego_size=ego, local_scale=SCALE)
        fast = projection.project_egocentric(
            jnp.asarray(feats), jnp.asarray(depth), heading,
            ego_size=ego, local_scale=SCALE, rotate_coords=True)
        ref = np.asarray(ref)[0, :, :, 0]
        fast = np.asarray(fast)[0, :, :, 0]
        ry, rx = np.unravel_index(np.argmax(ref), ref.shape)
        fy, fx = np.unravel_index(np.argmax(fast), fast.shape)
        assert abs(int(ry) - int(fy)) <= 1 and abs(int(rx) - int(fx)) <= 1, (
            angle, (ry, rx), (fy, fx))
        # the fast path lands the full value in one cell
        assert fast.max() == 7.0

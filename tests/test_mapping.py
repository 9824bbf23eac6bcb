"""Parity test for the full map registration chain vs a torch oracle.

Torch oracle mirrors `Mapping.project_feat_to_map`
(reference `vlnce_baselines/common/rgb_mapping.py:32-72`) with stock torch.
"""
import math

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ws_mgmap_tpu.ops import mapping

RNG = np.random.RandomState(2)

P = mapping.MapperParams(resolution=0.12, ego_size=10, global_size=24, map_depth=6)


def torch_get_grid(pose, size):
    x, y, t = pose[:, 0], pose[:, 1], pose[:, 2]
    cos_t, sin_t = t.cos(), t.sin()
    zeros, ones = torch.zeros_like(x), torch.ones_like(x)
    theta1 = torch.stack(
        [torch.stack([cos_t, -sin_t, zeros], 1), torch.stack([sin_t, cos_t, zeros], 1)], 1
    )
    theta2 = torch.stack(
        [torch.stack([ones, zeros, x], 1), torch.stack([zeros, ones, y], 1)], 1
    )
    rot = F.affine_grid(theta1, torch.Size(size), align_corners=False)
    tra = F.affine_grid(theta2, torch.Size(size), align_corners=False)
    return rot, tra


def torch_rotate(x, heading):
    sin_t = torch.sin(heading.squeeze(1))
    cos_t = torch.cos(heading.squeeze(1))
    a = torch.zeros(x.size(0), 2, 3)
    a[:, 0, 0] = cos_t
    a[:, 0, 1] = sin_t
    a[:, 1, 0] = -sin_t
    a[:, 1, 1] = cos_t
    grid = F.affine_grid(a, x.size(), align_corners=False)
    return F.grid_sample(x, grid, align_corners=False)


def torch_register(global_map_nhwc, proj_nchw, gps, compass, masks):
    g, e = P.global_size, P.ego_size
    bs = proj_nchw.shape[0]
    grid_x = ((P.coordinate_max - gps[:, 0]) / P.grid_size).round()
    grid_y = ((gps[:, 1] - P.coordinate_min) / P.grid_size).round()
    full = global_map_nhwc * masks.unsqueeze(1).unsqueeze(1)

    agent_view = torch.zeros(bs, proj_nchw.shape[1], g, g)
    lo = g // 2 - math.floor(e / 2)
    hi = g // 2 + math.ceil(e / 2)
    agent_view[:, :, lo:hi, lo:hi] = proj_nchw

    st_pose = torch.cat(
        [
            -(grid_y.unsqueeze(1) - (g // 2)) / (g // 2),
            -(grid_x.unsqueeze(1) - (g // 2)) / (g // 2),
            torch.zeros_like(compass),
        ],
        dim=1,
    )
    _, trans = torch_get_grid(st_pose, agent_view.size())
    translated = F.grid_sample(agent_view, trans, align_corners=False)

    fused = torch.max(
        torch.cat(
            [full.unsqueeze(1), translated.permute(0, 2, 3, 1).unsqueeze(1)], dim=1
        ),
        dim=1,
    )[0]

    st_pose_rev = torch.cat(
        [
            (grid_y.unsqueeze(1) - (g // 2)) / (g // 2),
            (grid_x.unsqueeze(1) - (g // 2)) / (g // 2),
            torch.zeros_like(compass),
        ],
        dim=1,
    )
    _, trans_rev = torch_get_grid(st_pose_rev, agent_view.size())
    back = F.grid_sample(fused.permute(0, 3, 1, 2).contiguous(), trans_rev, align_corners=False)
    crop = back[:, :, lo:hi, lo:hi]
    ego = torch_rotate(crop, compass)
    return ego, fused


def test_register_and_retrieve_parity():
    bs = 3
    # The persistent map is >= 0 by construction (starts at zero, max-fused
    # with zero-padded warps every step — the reference clamps negatives
    # implicitly at `rgb_mapping.py:55-56`); the windowed formulation
    # relies on that invariant, so the synthetic state must respect it.
    global_map = np.abs(
        RNG.randn(bs, P.global_size, P.global_size, P.map_depth)
    ).astype(np.float32)
    proj = RNG.randn(bs, P.ego_size, P.ego_size, P.map_depth).astype(np.float32)
    gps = RNG.uniform(-1.0, 1.0, size=(bs, 2)).astype(np.float32)
    compass = RNG.uniform(-np.pi, np.pi, size=(bs, 1)).astype(np.float32)
    masks = np.array([[1.0], [0.0], [1.0]], np.float32)

    ego, new_global = mapping.register_and_retrieve(
        jnp.asarray(global_map), jnp.asarray(proj), jnp.asarray(gps),
        jnp.asarray(compass), jnp.asarray(masks), P,
    )

    t_ego, t_global = torch_register(
        torch.from_numpy(global_map),
        torch.from_numpy(np.transpose(proj, (0, 3, 1, 2))),
        torch.from_numpy(gps),
        torch.from_numpy(compass),
        torch.from_numpy(masks),
    )

    np.testing.assert_allclose(np.asarray(new_global), t_global.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ego), (0, 3, 1, 2)), t_ego.numpy(), atol=1e-4, rtol=1e-4
    )


def test_episode_reset_clears_map():
    bs = 2
    global_map = np.abs(RNG.randn(bs, P.global_size, P.global_size, P.map_depth)).astype(np.float32)
    proj = np.zeros((bs, P.ego_size, P.ego_size, P.map_depth), np.float32)
    gps = np.zeros((bs, 2), np.float32)
    compass = np.zeros((bs, 1), np.float32)
    masks = np.zeros((bs, 1), np.float32)
    _, new_global = mapping.register_and_retrieve(
        jnp.asarray(global_map), jnp.asarray(proj), jnp.asarray(gps),
        jnp.asarray(compass), jnp.asarray(masks), P,
    )
    np.testing.assert_allclose(np.asarray(new_global), 0.0, atol=1e-6)


def test_rgb_mapping_step_shapes():
    p = mapping.MapperParams(ego_size=10, global_size=24, map_depth=6)
    bs = 2
    gm = mapping.init_global_map(bs, p)
    feat = jnp.asarray(RNG.randn(bs, 16, 16, 6).astype(np.float32))
    depth = jnp.asarray(RNG.rand(bs, 16, 16, 1).astype(np.float32))
    gps = jnp.zeros((bs, 2))
    compass = jnp.zeros((bs, 1))
    masks = jnp.ones((bs, 1))
    ego, gm2 = mapping.rgb_mapping_step(gm, feat, depth, gps, compass, masks, p)
    assert ego.shape == (bs, 10, 10, 6)
    assert gm2.shape == gm.shape


def test_windowed_equals_reference_chain():
    """The integer-offset window formulation must match the literal warp
    chain, including at map edges where content clips."""
    import jax.numpy as jnp
    bs = 4
    p = mapping.MapperParams(resolution=0.12, ego_size=10, global_size=24,
                             map_depth=6)
    global_map = np.abs(RNG.randn(bs, 24, 24, 6)).astype(np.float32)
    proj = RNG.randn(bs, 10, 10, 6).astype(np.float32)
    # sample 0 centered; samples 1-3 near/over the map edges
    gps = np.array([
        [0.0, 0.0],
        [1.3, -1.2],
        [-1.4, 1.35],   # near corner
        [1.44, 1.44],   # at the boundary
    ], np.float32)
    compass = RNG.uniform(-np.pi, np.pi, (bs, 1)).astype(np.float32)
    masks = np.ones((bs, 1), np.float32)

    ego_a, glob_a = mapping.register_and_retrieve(
        jnp.asarray(global_map), jnp.asarray(proj), jnp.asarray(gps),
        jnp.asarray(compass), jnp.asarray(masks), p)
    ego_b, glob_b = mapping.register_and_retrieve_reference(
        jnp.asarray(global_map), jnp.asarray(proj), jnp.asarray(gps),
        jnp.asarray(compass), jnp.asarray(masks), p)

    np.testing.assert_allclose(np.asarray(glob_a), np.asarray(glob_b),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ego_a), np.asarray(ego_b),
                               atol=1e-5, rtol=1e-5)


def test_windowed_fully_off_map():
    """A window entirely past the map edge drops all content and retrieves
    zeros, exactly like the reference's zero-padded warp chain."""
    bs = 2
    p = mapping.MapperParams(resolution=0.12, ego_size=10, global_size=24,
                             map_depth=6)
    global_map = np.abs(RNG.randn(bs, 24, 24, 6)).astype(np.float32)
    proj = RNG.randn(bs, 10, 10, 6).astype(np.float32)
    gps = np.array([[2.9, -2.9], [-3.1, 3.0]], np.float32)  # beyond bounds
    compass = np.zeros((bs, 1), np.float32)
    masks = np.ones((bs, 1), np.float32)
    ego_a, glob_a = mapping.register_and_retrieve(
        jnp.asarray(global_map), jnp.asarray(proj), jnp.asarray(gps),
        jnp.asarray(compass), jnp.asarray(masks), p)
    ego_b, glob_b = mapping.register_and_retrieve_reference(
        jnp.asarray(global_map), jnp.asarray(proj), jnp.asarray(gps),
        jnp.asarray(compass), jnp.asarray(masks), p)
    np.testing.assert_allclose(np.asarray(glob_a), np.asarray(glob_b),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ego_a), np.asarray(ego_b),
                               atol=1e-5, rtol=1e-5)

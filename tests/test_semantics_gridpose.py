"""Semantics taxonomy, GT-map builder tools, grid-pose helpers, replay prefetch."""
import os

import numpy as np

from ws_mgmap_tpu.env import semantics
from ws_mgmap_tpu.env.dataset import make_fake_dataset
from ws_mgmap_tpu.env.sensors import ShortestPathFollower
from ws_mgmap_tpu.env.sim import FakeSim
from ws_mgmap_tpu.utils import grid_pose
from ws_mgmap_tpu.utils.geometry import AgentState, quat_from_yaw

RNG = np.random.RandomState(13)


def test_label_tables():
    assert semantics.LABEL_40_TO_27.shape == (41,)
    assert semantics.LABEL_40_TO_27.max() == 26
    out = semantics.convert_labels(np.array([-1, 0, 1, 40]))
    assert out[0] == 0 and out[1] == 0


def test_rasterize_gt_map_places_points():
    # one point 1.2m in front of a north-facing agent at origin
    x = np.array([0.0]); y = np.array([1.2]); labels = np.array([5.0])
    grid = semantics.rasterize_gt_map(x, y, labels, (0.0, 0.0, 0.0),
                                      grid_dim=40, cell_size=0.12)
    rows, cols = np.nonzero(grid)
    assert len(rows) == 1 and grid[rows[0], cols[0]] == 5.0


def test_build_episode_gt_map(tmp_path):
    ds = make_fake_dataset(num_episodes=1, seed=5)
    ep = ds.episodes[0]
    sim = FakeSim(ep.scene_id)
    path = semantics.build_episode_gt_map(sim, ep, str(tmp_path))
    grid = np.load(path)
    assert grid.shape == (480, 480)
    assert (grid > 0).any()  # walls present


def test_grid_pose_roundtrip():
    trace = grid_pose.PoseTrace(grid_dim=512, cell_size=0.05)
    s0 = AgentState(np.array([0.0, 0.0, 0.0]), quat_from_yaw(0.0))
    trace.append(s0)
    c0 = trace.agent_grid_coords(0)
    # move 1m forward (-z): in the 2d convention x=-pos_z increases
    s1 = AgentState(np.array([0.0, 0.0, -1.0]), quat_from_yaw(0.0))
    trace.append(s1)
    c1 = trace.agent_grid_coords(1)
    d = np.abs(c1 - c0).max()
    assert abs(d - 20) <= 1, (c0, c1)  # 1m / 0.05m = 20 cells


def test_follower_class_surface():
    ds = make_fake_dataset(num_episodes=1, seed=6)
    ep = ds.episodes[0]
    sim = FakeSim(ep.scene_id)
    sim.reset_agent(ep.start_position, ep.start_rotation_quat)
    f = ShortestPathFollower(sim, 0.5, return_one_hot=False)
    assert f.mode == "geodesic_path"
    a = f.get_next_action(ep.goals[0]["position"])
    # None when within goal radius, as the reference follower
    # (`shortest_path_follower.py:62-69`); otherwise a discrete action
    assert a in (None, 1, 2, 3)


def test_replay_prefetch_iteration(tmp_path):
    from ws_mgmap_tpu.data.trajstore import TrajStoreWriter, pack_record
    from ws_mgmap_tpu.train.replay import ReplayLoader

    d = str(tmp_path / "traj")
    w = TrajStoreWriter(d)
    recs = []
    for t in (5, 7, 6, 8):
        recs.append(pack_record({
            "obs": {"waypoint": RNG.randn(t, 2).astype(np.float32)},
            "prev_actions": RNG.randn(t, 2).astype(np.float32),
            "oracle_actions": RNG.randn(t, 2).astype(np.float32),
        }))
    w.append_batch(recs)
    w.close()
    loader = ReplayLoader(d, batch_size=2, t_bucket=4) if False else \
        ReplayLoader(d, batch_size=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["weights"].shape == b["not_done_masks"].shape
    assert b["obs"]["waypoint"].shape[:2] == b["weights"].shape
    # padded steps have zero weight
    assert (b["weights"].sum(axis=1) >= 1).all()

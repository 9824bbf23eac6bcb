"""Env layer: FakeSim physics, sensors, measures, env protocol, vector env."""
import math

import numpy as np
import pytest

from ws_mgmap_tpu.config.default import get_config
from ws_mgmap_tpu.env.dataset import fake_gt_locations, make_fake_dataset
from ws_mgmap_tpu.env.environments import VLNCEDaggerEnv
from ws_mgmap_tpu.env.sensors import greedy_follower_action
from ws_mgmap_tpu.env.sim import FakeSim, get_scene
from ws_mgmap_tpu.env.vector_env import construct_envs
from ws_mgmap_tpu.utils.geometry import quat_from_yaw


@pytest.fixture(scope="module")
def dataset():
    return make_fake_dataset(num_episodes=4, seed=1)


@pytest.fixture(scope="module")
def config():
    cfg = get_config()
    cfg.defrost()
    cfg.NUM_PROCESSES = 2
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 60
    return cfg


def test_fakesim_determinism_and_motion():
    sim1 = FakeSim("fake/sceneA")
    sim2 = FakeSim("fake/sceneA")
    start = sim1.scene.sample_navigable(np.random.RandomState(0))
    for s in (sim1, sim2):
        s.reset_agent(start, quat_from_yaw(0.0))
    o1, o2 = sim1.render(), sim2.render()
    np.testing.assert_array_equal(o1["depth"], o2["depth"])
    np.testing.assert_array_equal(o1["rgb"], o2["rgb"])

    p0 = sim1.get_agent_state().position.copy()
    sim1.step(1)  # forward = -z at yaw 0
    p1 = sim1.get_agent_state().position
    moved = p1 - p0
    assert moved[2] <= 0.0 and abs(moved[0]) < 1e-9
    sim1.step(2)
    sim1.step(2)
    assert abs(sim1._yaw - math.radians(30)) < 1e-9


def test_geodesic_consistency(dataset):
    ep = dataset.episodes[0]
    sim = FakeSim(ep.scene_id)
    d = sim.geodesic_distance(np.asarray(ep.start_position),
                              ep.goals[0]["position"])
    assert abs(d - ep.info["geodesic_distance"]) < 1e-6
    pts = sim.get_straight_shortest_path_points(
        np.asarray(ep.start_position), ep.goals[0]["position"])
    assert len(pts) >= 2
    # polyline length >= geodesic (simplification) but comparable
    length = sum(np.linalg.norm(pts[i + 1] - pts[i]) for i in range(len(pts) - 1))
    assert length <= d * 1.5 + 0.5


def test_follower_reaches_goal(dataset):
    """The greedy follower must navigate every fake episode to its goal."""
    for ep in dataset.episodes:
        sim = FakeSim(ep.scene_id)
        sim.reset_agent(ep.start_position, ep.start_rotation_quat)
        goal = ep.goals[0]["position"]
        for _ in range(400):
            a = greedy_follower_action(sim, goal, goal_radius=0.5)
            if a == 0:
                break
            sim.step(a)
        assert sim.geodesic_distance(sim.get_agent_state().position, goal) < 0.5


def test_env_episode_protocol(config, dataset):
    gt = fake_gt_locations(dataset)
    env = VLNCEDaggerEnv(config, dataset, gt, auto_reset_done=False, seed=0)
    obs = env.reset()
    for key in ("rgb", "depth", "instruction", "progress", "waypoint",
                "gt_path", "gt_semantic_map", "gps", "compass", "heading",
                "vln_oracle_action_sensor"):
        assert key in obs, key
    assert obs["rgb"].shape == (224, 224, 3)
    assert obs["depth"].shape == (256, 256, 1)
    assert obs["gt_path"].shape == (100, 100)
    assert obs["gt_semantic_map"].shape == (100, 100)
    assert abs(float(obs["progress"][0])) < 1e-6
    np.testing.assert_allclose(obs["gps"], 0.0, atol=1e-9)

    # first 24 steps are a forced spin regardless of the action
    yaw0 = env.sim._yaw
    for i in range(24):
        obs, _, done, info = env.step({"action": np.zeros(2), "prog": -1})
        assert not done
    assert abs(((env.sim._yaw - yaw0) + math.pi) % (2 * math.pi) - math.pi) < 1e-6
    np.testing.assert_allclose(
        env.sim.get_agent_state().position, env.episode.start_position, atol=1e-9)

    # drive with the oracle waypoint: progress should become positive
    max_prog = 0.0
    for i in range(36):
        obs, _, done, info = env.step(
            {"action": np.arctanh(np.clip(obs["waypoint"], -0.99, 0.99)),
             "prog": -1})
        max_prog = max(max_prog, float(obs["progress"][0]))
        if done:
            break
    assert max_prog > 0.2, max_prog
    metrics = env.get_metrics()
    for k in ("distance_to_goal", "success", "spl", "ndtw", "path_length",
              "oracle_success", "steps_taken", "sdtw", "oracle_spl",
              "oracle_navigation_error"):
        assert k in metrics
    assert metrics["steps_taken"] > 0
    assert 0.0 <= metrics["ndtw"] <= 1.0


def test_vector_env_pause_resume(config, dataset):
    gt = fake_gt_locations(dataset)
    envs = construct_envs(config, dataset, gt, workers=False)
    assert envs.num_envs == 2
    obs = envs.reset()
    assert len(obs) == 2
    out = envs.step([{"action": np.zeros(2), "prog": -1}] * 2)
    assert len(out) == 2
    envs.pause_at(0)
    assert envs.num_envs == 1
    out = envs.step([{"action": np.zeros(2), "prog": -1}])
    assert len(out) == 1
    envs.resume_all()
    assert envs.num_envs == 2
    envs.close()


def test_vector_env_worker_processes(config, dataset):
    gt = fake_gt_locations(dataset)
    envs = construct_envs(config, dataset, gt, workers=True)
    obs = envs.reset()
    assert len(obs) == 2 and "rgb" in obs[0]
    out = envs.step([{"action": np.zeros(2), "prog": -1}] * 2)
    obs2 = [o[0] for o in out]
    assert obs2[0]["depth"].shape == (256, 256, 1)
    assert envs.number_of_episodes[0] >= 1
    eps = envs.current_episodes()
    assert eps[0].episode_id is not None
    envs.close()


def test_env_with_ddppo_controller(config, dataset):
    """Eval-mode env with the DD-PPO local controller in the loop
    (random weights; exercises the waypoint->(rho,phi)->discrete path)."""
    from ws_mgmap_tpu.env.dataset import fake_gt_locations
    cfg = config.clone()
    cfg.defrost()
    cfg.use_ddppo = True
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 30
    env = VLNCEDaggerEnv(cfg, dataset, fake_gt_locations(dataset),
                         auto_reset_done=False, seed=0)
    obs = env.reset()
    for step in range(28):
        obs, _, done, info = env.step({
            "action": np.arctanh(np.clip(obs["waypoint"], -0.99, 0.99)),
            "prog": -1,
            "epidsode_reset_flag": step == 0,
            "depth_img": obs["depth"],
        })
        if done:
            break
    assert env._elapsed_steps > 24

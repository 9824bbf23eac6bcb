"""Dataset rank sharding + replay rank sharding + scene round-robin."""
import numpy as np

from ws_mgmap_tpu.data.trajstore import TrajStoreWriter, pack_record
from ws_mgmap_tpu.env.dataset import (
    make_fake_dataset,
    round_robin_scene_split,
)
from ws_mgmap_tpu.train.replay import ReplayLoader

RNG = np.random.RandomState(17)


def test_dataset_rank_split_partition():
    ds = make_fake_dataset(num_episodes=16, scenes=["fake/a", "fake/b"], seed=2)
    shards = [ds.split_by_rank(2, r) for r in range(2)]
    ids0 = {e.episode_id for e in shards[0].episodes}
    ids1 = {e.episode_id for e in shards[1].episodes}
    assert not (ids0 & ids1), "rank shards must be disjoint"
    # per-scene contiguous split keeps every scene represented on each rank
    assert {e.scene_id for e in shards[0].episodes} == set(ds.scenes())


def test_scene_round_robin():
    splits = round_robin_scene_split(["s0", "s1", "s2", "s3", "s4"], 2)
    assert splits == [["s0", "s2", "s4"], ["s1", "s3"]]


def test_replay_loader_rank_sharding(tmp_path):
    d = str(tmp_path / "traj")
    w = TrajStoreWriter(d)
    recs = []
    for t in range(8):
        recs.append(pack_record({
            "obs": {"waypoint": np.full((5, 2), float(t), np.float32)},
            "prev_actions": np.zeros((5, 2), np.float32),
            "oracle_actions": np.zeros((5, 2), np.float32),
        }))
    w.append_batch(recs)
    w.close()

    seen = []
    for rank in range(2):
        loader = ReplayLoader(d, batch_size=2, rank=rank, world_size=2, seed=9)
        for batch in loader:
            seen.append((rank, batch["obs"]["waypoint"][:, 0, 0]))
    vals_by_rank = {r: set() for r in range(2)}
    for r, vals in seen:
        vals_by_rank[r] |= set(float(v) for v in vals)
    assert not (vals_by_rank[0] & vals_by_rank[1]), vals_by_rank
    assert len(vals_by_rank[0] | vals_by_rank[1]) == 8


def _tiny_live_policy(batch):
    """Tiny policy over RAW rgb/depth so the LIVE perception path — UNet ->
    pinhole projection -> ground splat -> global-map registration — runs
    (not the cached-feature bypass)."""
    import jax
    import jax.numpy as jnp

    from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
    from ws_mgmap_tpu.ops.mapping import MapperParams, init_global_map

    cfg = MGMapConfig(
        vocab_size=64, instr_hidden=16, rgb_output_size=32,
        depth_output_size=16, depth_spatial=1, unet_width=0.25,
        map_output_size=32, ego_map_size=20, map_depth=16, hidden_size=64,
        mapper=MapperParams(ego_size=20, global_size=48, map_depth=16),
    )
    policy = BasePolicy(cfg)
    rng = np.random.RandomState(3)
    obs = [
        {
            "instruction": rng.randint(1, 64, (16,)).astype(np.int64),
            "rgb": rng.randint(0, 255, (64, 64, 3)).astype(np.float32),
            "depth": rng.rand(64, 64, 1).astype(np.float32) * 0.5,
            "gps": rng.randn(2).astype(np.float32) * 0.4,
            "compass": rng.randn(1).astype(np.float32) * 0.5,
        }
        for _ in range(batch)
    ]
    hidden = jnp.zeros((2, batch, cfg.hidden_size))
    masks = jnp.ones((batch, 1))
    gmap = init_global_map(batch, cfg.mapper)
    from ws_mgmap_tpu.train.rollout import RolloutEngine

    probe = RolloutEngine(policy, {}, batch, instruction_len=16)
    bo = probe.batch_obs(obs)
    variables = policy.init(jax.random.PRNGKey(0), bo, hidden, masks, gmap,
                            method=BasePolicy.act)
    return policy, variables, obs


def test_rollout_engine_dp_equivalence():
    """VERDICT r4 #2: the live rollout step (UNet -> projection -> splat ->
    register -> CMA act) sharded over an 8-device dp mesh must produce the
    same ego maps / actions / hidden state as the single-device step."""
    import numpy as np

    from ws_mgmap_tpu.parallel.mesh import make_mesh
    from ws_mgmap_tpu.train.rollout import RolloutEngine

    b = 8
    policy, variables, obs = _tiny_live_policy(b)
    e1 = RolloutEngine(policy, variables, b, instruction_len=16)
    e8 = RolloutEngine(policy, variables, b, instruction_len=16,
                       mesh=make_mesh(dp=8))
    assert e8.mesh is not None, "dp mesh was rejected"

    masks0 = np.zeros((b, 1), np.float32)  # episode start
    masks1 = np.ones((b, 1), np.float32)
    batch = e1.batch_obs(obs)

    ego_a = np.asarray(e1.update_map(batch, masks0))
    ego_b = np.asarray(e8.update_map(batch, masks0))
    np.testing.assert_allclose(ego_a, ego_b, rtol=2e-4, atol=2e-4)

    # second step carries the registered global map across devices
    ego_a2 = np.asarray(e1.update_map(batch, masks1))
    ego_b2 = np.asarray(e8.update_map(batch, masks1))
    np.testing.assert_allclose(ego_a2, ego_b2, rtol=2e-4, atol=2e-4)

    out1 = e1.act(batch, masks1)
    out8 = e8.act(batch, masks1)
    np.testing.assert_allclose(np.asarray(out1.action),
                               np.asarray(out8.action), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out1.hidden),
                               np.asarray(out8.hidden), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out1.global_map),
                               np.asarray(out8.global_map),
                               rtol=2e-4, atol=2e-4)

    # uneven batch (paused envs): falls back to the largest dividing dp
    e1.keep([0, 1, 2, 3, 4, 5])
    e8.keep([0, 1, 2, 3, 4, 5])
    batch6 = e1.batch_obs(obs[:6])
    ego6_a = np.asarray(e1.update_map(batch6, masks1[:6]))
    ego6_b = np.asarray(e8.update_map(batch6, masks1[:6]))
    np.testing.assert_allclose(ego6_a, ego6_b, rtol=2e-4, atol=2e-4)

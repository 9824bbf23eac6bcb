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

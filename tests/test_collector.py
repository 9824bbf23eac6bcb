"""beta=1 (unique-episode) collection dedup semantics.

The reference reads `envs.current_episodes()` AFTER habitat's auto-reset,
so the id it logs when an episode's record flushes is the successor's
(`dagger_trainer.py:361-362,400-406`). Our collector pins each slot's
episode id at episode START; these tests assert true exactly-once
semantics: every episode id appears exactly once in both the store and
`collected_ep.txt`, and each record's `ep_id` matches the episode whose
observations it actually contains.

Uses a stub rollout engine (no jax model) so the test is pure host logic
and runs in the default (non-slow) suite.
"""
import os

import numpy as np

from tests.test_integration import tiny_config


class _StubOutputs:
    def __init__(self, n):
        self.action = np.zeros((n, 2), np.float32)
        self.rgb_features = np.zeros((n, 2, 2, 4), np.float32)
        self.depth_features = np.zeros((n, 2, 2, 2), np.float32)
        self.ego_map = np.zeros((n, 4, 4, 2), np.float32)


class _StubEngine:
    """Duck-types the RolloutEngine surface collect_dataset touches."""

    def __init__(self):
        self.num_envs = 0

    def reset_state(self, n):
        self.num_envs = n

    def batch_obs(self, observations):
        return observations  # collector treats the batch as opaque

    def act(self, batch, masks, deterministic=True):
        return _StubOutputs(len(batch))

    def update_map(self, batch, masks):
        return np.zeros((len(batch), 4, 4, 2), np.float32)

    def zero_hidden_at(self, idx):
        pass

    def keep(self, keep_indices):
        self.num_envs = len(keep_indices)


def test_beta1_dedup_exactly_once(tmp_path):
    from ws_mgmap_tpu.data.trajstore import TrajStoreReader, unpack_record
    from ws_mgmap_tpu.train.collector import collect_dataset
    from ws_mgmap_tpu.train.trainer import load_split

    cfg = tiny_config(str(tmp_path))
    cfg.defrost()
    cfg.DAGGER.UPDATE_SIZE = 4  # == FAKE_EPISODES: every episode collected
    cfg.DAGGER.P = 1.0  # beta = 1 -> ensure_unique
    cfg.freeze()

    dataset, gt = load_split(cfg, cfg.TASK_CONFIG.DATASET.SPLIT)
    store = str(tmp_path / "traj")
    collected = collect_dataset(cfg, _StubEngine(), dataset, gt, store, 0,
                                workers=False)
    assert collected >= 1

    # dedup log: unique ids, all real dataset episodes
    with open(os.path.join(store, "collected_ep.txt")) as fp:
        log_ids = [ln.strip() for ln in fp if ln.strip()]
    assert len(log_ids) == len(set(log_ids)), f"duplicate ids in log: {log_ids}"
    all_ids = {e.episode_id for e in dataset.episodes}
    assert set(log_ids) <= all_ids

    # store: one record per logged id, ids match 1:1 (exactly-once)
    reader = TrajStoreReader(store)
    recs = [unpack_record(reader.get(i)) for i in range(len(reader))]
    reader.close()
    assert len(recs) == collected == len(log_ids)
    rec_ids = [str(np.asarray(r["ep_id"]).item()) for r in recs]
    assert sorted(rec_ids) == sorted(log_ids)

    # each record's id names the episode whose data it holds: match the
    # stored instruction tokens against the dataset episode of that id
    # (this is the assertion the round-4 off-by-one would have failed —
    # it logged successor B's id on episode A's record)
    by_id = {e.episode_id: e for e in dataset.episodes}
    for r, eid in zip(recs, rec_ids):
        instr = by_id[eid].instruction
        want = np.asarray(
            instr["instruction_tokens"] if isinstance(instr, dict)
            else instr.instruction_tokens, np.int64)
        got = np.asarray(r["obs"]["instruction"][0], np.int64)
        t = min(want.shape[0], got.shape[0])
        assert np.array_equal(got[:t], want[:t]), (
            f"record labeled {eid} holds another episode's instruction")
